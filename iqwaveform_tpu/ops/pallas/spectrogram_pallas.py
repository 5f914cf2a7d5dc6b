"""Pallas TPU kernel: windowed spectrogram frames -> dB, in one pass.

The streaming persistence fold's transform stage (window multiply ->
four-step DFT -> |.|^2 -> dB) costs ~2.5-3 ms per 2^24-sample chunk
through XLA: each einsum stage materializes a full complex
intermediate in HBM, and the small stage-1 DFT contracts only
a = nfft/128 wide. This kernel runs the whole chain VMEM-resident per
block and packs stage 1 to full MXU width as a block-diagonal
constant kron(I_{128/a}, Fa) applied to (128/a) frames stacked on
sublanes — the same trick as the slab-packed histogram
(colhist_pallas): a dot pays a full pipeline pass however few lanes
it fills, so fill them.

Output is the spectrogram dB frame batch in the four-step transform's
FACTORED bin order (flat position k1*b + k2 holds natural bin
k2*a + k1) — exactly what parallel.streaming's persistence fold
consumes (per-bin reductions are bin-order independent; the carry is
unscrambled once at readout). Reference semantics: fourier.py:
1203-1233 (spectrogram) in dB, noverlap=0.

Layout rules as the other kernels here (ROADMAP.md): BlockSpec-driven
2-D pipelining, no manual DMA, no fori_loop, 128-lane minors;
in-kernel ops are sublane tile-repeats, dots against host constants,
and elementwise VPU (log lowers through Mosaic — proven by
chan_stats_pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import lru_cache
from ._common import on_tpu_like as _on_tpu_like
from .fused_ola_pallas import _make_dot

__all__ = [
    'spectrogram_dB_pallas',
    'spectrogram_levels_pallas',
    'spectrogram_levels_supported',
    'spectrogram_pallas_supported',
]

_LANES = 128
_ROWS = 1024  # sublane rows processed per grid step
_LN10_INV_10 = float(10.0 / np.log(10.0))


def spectrogram_pallas_supported(nfft: int, n_samples: int) -> bool:
    """kernel applies when nfft = a*128 with the frame rows of one
    grid step filling the (1024, 128) block exactly."""
    if nfft % _LANES:
        return False
    a = nfft // _LANES
    if a < 1 or a > _LANES or _LANES % a or _ROWS % a:
        return False
    return n_samples % (_ROWS * _LANES) == 0


@lru_cache()
def _spg_constants(nfft: int, w_key: bytes):
    """host-side factored window / DFT constants (f32 planes). The DFT
    matrices come from the same _dft_constants the mxu path uses, so
    the factored bin order of both backends agrees by construction
    (plan_factors(a*128) = (a, 128) for every supported a)."""
    from ..mxu_fft import _dft_constants, plan_factors

    a, b = plan_factors(nfft)
    assert b == _LANES and a == nfft // _LANES, (a, b)
    _, _, Fa, Fb, W = _dft_constants(nfft, False)

    # stage-1 packing: one (128, 128) dot transforms 128/a frames
    BdFa = np.kron(np.eye(_LANES // a, dtype='complex64'), Fa)

    # fftshift-baked, 1/nfft-scaled window in factored (a, b) layout
    w = np.frombuffer(w_key, dtype='complex64').reshape(a, b)

    def planes(x):
        x = np.ascontiguousarray(x)
        return x.real.astype('float32'), x.imag.astype('float32')

    return (*planes(w), *planes(BdFa), *planes(W), *planes(Fb))


def _split_bf16(v):
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_makers(passes):
    """(make_dot_lhsconst, make_dot_rhsconst) factories binding one
    constant operand of a 128-wide contraction, with the hi/lo bf16
    3-pass splits of the constant hoisted out of the slab loop
    (Mosaic lowers only DEFAULT/HIGHEST; _make_dot(3) would re-split
    per call)."""
    if passes == 3:
        dd = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        def make_dot_lhsconst(c):
            ch, cl = _split_bf16(c)

            def dot(x):
                xh, xl = _split_bf16(x)
                return dd(ch, xh) + dd(ch, xl) + dd(cl, xh)

            return dot

        def make_dot_rhsconst(c):
            ch, cl = _split_bf16(c)

            def dot(x):
                xh, xl = _split_bf16(x)
                return dd(xh, ch) + dd(xh, cl) + dd(xl, ch)

            return dot
    else:
        d2 = _make_dot(passes)

        def make_dot_lhsconst(c):
            return lambda x: d2(c, x)

        def make_dot_rhsconst(c):
            return lambda x: d2(x, c)

    return make_dot_lhsconst, make_dot_rhsconst


def _cmul_makers(passes):
    """(make_cmul_lhsconst, make_cmul_rhsconst): complex-matmul closures
    binding one constant complex operand. At the 1-/3-pass tiers they
    use Gauss's 3-multiplication form (real = m1-m3, imag = m1+m2 from
    m1 = (xr+xi)@yr, m2 = xr@(yi-yr), m3 = xi@(yr+yi)) with the
    constant combinations and their hi/lo splits hoisted out of the
    slab loop — 25% fewer MXU passes on pass-bound kernels; same error
    analysis as fused_ola_pallas._fused_chain. The 6-pass tier keeps
    the plain 4-dot form as the accuracy reference."""
    make_dot_lhsconst, make_dot_rhsconst = _dot_makers(passes)
    gauss = passes != 6

    def make_cmul_lhsconst(cr, ci):
        if not gauss:
            dr_, di_ = make_dot_lhsconst(cr), make_dot_lhsconst(ci)

            def cmul(xr, xi):
                return dr_(xr) - di_(xi), dr_(xi) + di_(xr)

            return cmul
        d1 = make_dot_lhsconst(cr)
        d2 = make_dot_lhsconst(cr + ci)
        d3 = make_dot_lhsconst(ci - cr)

        def cmul(xr, xi):
            m1 = d1(xr + xi)
            return m1 - d2(xi), m1 + d3(xr)

        return cmul

    def make_cmul_rhsconst(cr, ci):
        if not gauss:
            dr_, di_ = make_dot_rhsconst(cr), make_dot_rhsconst(ci)

            def cmul(xr, xi):
                return dr_(xr) - di_(xi), dr_(xi) + di_(xr)

            return cmul
        d1 = make_dot_rhsconst(cr)
        d2 = make_dot_rhsconst(ci - cr)
        d3 = make_dot_rhsconst(cr + ci)

        def cmul(xr, xi):
            m1 = d1(xr + xi)
            return m1 - d3(xi), m1 + d2(xr)

        return cmul

    return make_cmul_lhsconst, make_cmul_rhsconst


def _block_dB_slabs(
    xr_ref, xi_ref, wr_ref, wi_ref, bfr_ref, bfi_ref,
    twr_ref, twi_ref, fbr_ref, fbi_ref, *, a, passes, interpret,
):
    """yield (rows, dB) per 128-row slab of the block: the shared
    window multiply -> packed four-step DFT -> |.|^2 -> dB chain of the
    spectrogram kernels."""
    make_cmul_lhsconst, make_cmul_rhsconst = _cmul_makers(passes)

    def rep(x, n):
        if interpret:
            return jnp.concatenate([x] * n, axis=0)
        return pltpu.repeat(x, n, axis=0)

    ar = xr_ref[...]  # (1024, 128): rows f*a + i1, lanes i2
    ai = xi_ref[...]

    # window (factored (a, b) -> tiled over the block's frames)
    wfr = rep(wr_ref[...], _ROWS // a)
    wfi = rep(wi_ref[...], _ROWS // a)
    cr = ar * wfr - ai * wfi
    ci = ar * wfi + ai * wfr

    # twiddles tiled over one slab's 128/a frames
    twr = rep(twr_ref[...], _LANES // a)
    twi = rep(twi_ref[...], _LANES // a)

    cmul_bf = make_cmul_lhsconst(bfr_ref[...], bfi_ref[...])
    cmul_fb = make_cmul_rhsconst(fbr_ref[...], fbi_ref[...])

    for s in range(_ROWS // _LANES):
        rows = slice(s * _LANES, (s + 1) * _LANES)
        sr, si = cr[rows, :], ci[rows, :]
        # stage 1: block-diagonal length-a DFTs down the frame rows
        br, bi = cmul_bf(sr, si)
        # twiddle
        tr = br * twr - bi * twi
        ti = br * twi + bi * twr
        # stage 2: length-b DFTs along the lanes
        dr, di = cmul_fb(tr, ti)
        p = dr * dr + di * di
        yield rows, _LN10_INV_10 * jnp.log(p + 1e-25)


def _spg_kernel(
    xr_ref, xi_ref, wr_ref, wi_ref, bfr_ref, bfi_ref,
    twr_ref, twi_ref, fbr_ref, fbi_ref, out_ref, *, a, passes, interpret
):
    for rows, dB in _block_dB_slabs(
        xr_ref, xi_ref, wr_ref, wi_ref, bfr_ref, bfi_ref,
        twr_ref, twi_ref, fbr_ref, fbi_ref,
        a=a, passes=passes, interpret=interpret,
    ):
        out_ref[rows, :] = dB


def _spectrogram_dB_xla(xr, xi, w_scaled: np.ndarray, nfft: int):
    """XLA twin of the fused dB-spectrogram kernels (the grad_fallback
    target): factored four-step transform in the SAME flat bin order
    (position k1*128 + k2), f32 HIGHEST dots."""
    from ..mxu_fft import four_step_factored

    frames = (xr + 1j * xi).astype(jnp.complex64).reshape(-1, nfft)
    frames = frames * jnp.asarray(w_scaled)[None, :]
    D = four_step_factored(frames, nfft)
    p = (D.real * D.real + D.imag * D.imag).reshape(frames.shape[0], nfft)
    return 10.0 * jnp.log10(p + 1e-25)


def spectrogram_dB_pallas(
    xr,
    xi,
    w: np.ndarray,
    nfft: int,
    *,
    passes: int = 6,
    interpret: bool = None,
):
    """dB spectrogram of non-overlapping ``nfft`` frames from float32
    (real, imag) planes, bins in FACTORED four-step order.

    Args:
        xr, xi: (n,) float32 planes, n a multiple of 1024*128
        w: (nfft,) complex64 host window (fftshift baked, WITHOUT the
            1/nfft scale — applied here)
        passes: 6 = f32 HIGHEST dots (~3e-6 relative of the dB value on
            chip); 3 = hi/lo bf16 split dropping the lo*lo term
            (~2.5e-4 relative, i.e. ~0.02 dB worst-case on low-power
            bins — one histogram bin width is typically ~0.2 dB);
            1 = plain bf16 dots (~0.05 dB)

    Returns:
        (n // nfft, nfft) float32 dB spectrogram; flat bin position
        k1*128 + k2 holds natural bin k2*a + k1 (a = nfft // 128) —
        undo with design_persistence's unscramble.

    Differentiation dispatches both primal and tangent to the XLA
    four-step twin (_spectrogram_dB_xla) via grad_fallback.
    """
    if interpret is None:
        interpret = not _on_tpu_like()
    n = xr.shape[0]
    if not spectrogram_pallas_supported(nfft, n):
        raise ValueError(
            f'unsupported shape: nfft={nfft}, n={n} (need nfft = a*128, '
            f'a a power-of-two divisor of 128, n % {_ROWS * _LANES} == 0)'
        )
    a = nfft // _LANES

    w_scaled = np.ascontiguousarray((w / nfft).astype('complex64'))
    w_key = w_scaled.tobytes()
    consts = _spg_constants(nfft, w_key)

    n_steps = n // (_ROWS * _LANES)

    def vec_spec(c):
        return pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim)

    def _impl(xr, xi):
        out = pl.pallas_call(
            functools.partial(
                _spg_kernel, a=a, passes=passes, interpret=interpret
            ),
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)),
                pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)),
                *[vec_spec(c) for c in consts],
            ],
            out_specs=pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (n // _LANES, _LANES), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('parallel',),
            ),
            interpret=interpret,
        )(
            xr.reshape(n // _LANES, _LANES),
            xi.reshape(n // _LANES, _LANES),
            *[jnp.asarray(c) for c in consts],
        )
        return out.reshape(n // nfft, nfft)

    from ._common import grad_fallback

    return grad_fallback(
        _impl, lambda xr, xi: _spectrogram_dB_xla(xr, xi, w_scaled, nfft)
    )(xr, xi)


def spectrogram_levels_supported(nfft: int, n_samples: int) -> bool:
    """the fused levels+stats variant additionally needs a = nfft/128 >=
    8 sublane rows so the per-(k1, k2) stat accumulators form whole
    (a, 128) tiles."""
    return spectrogram_pallas_supported(nfft, n_samples) and nfft // _LANES >= 8


def _spg_levels_kernel(
    xr_ref, xi_ref, wr_ref, wi_ref, bfr_ref, bfi_ref,
    twr_ref, twi_ref, fbr_ref, fbi_ref, gbin_ref,
    *outs,
    a, passes, interpret, q_lo, q_scale, n_bins, apd_navg, emit_levels,
):
    """_spg_kernel plus fused histogram quantization and per-bin
    sum/max/min accumulation, so the persistence fold never writes the
    dB spectrogram to HBM or reads it back (VERDICT r2 #2).

    Outputs: idx (block layout as the dB output — rows f*a + k1, lanes
    k2 — holding the clipped uniform-bin level of each dB value) and
    (a, 128) accumulators psum/pmax/pmin per factored (k1, k2) bin.
    With apd_navg > 0, additionally the detector-binned |x|^2 of the
    raw stream (the monitor CCDF workflow's binning) as one grouping
    dot per block — the streaming fold's APD stage then never re-reads
    the chunk (live lanes [0, 128/navg), padding +inf). With
    emit_levels=False the idx output is dropped entirely (stats-only
    persistence folds: HBM traffic collapses to the input reads plus
    the tiny accumulators).
    """
    i = 0
    idx_ref = None
    if emit_levels:
        idx_ref = outs[0]
        i = 1
    psum_ref, pmax_ref, pmin_ref = outs[i : i + 3]
    maybe_pbin = outs[i + 3 :]

    @pl.when(pl.program_id(0) == 0)
    def _():
        psum_ref[...] = jnp.zeros_like(psum_ref)
        pmax_ref[...] = jnp.full_like(pmax_ref, -jnp.inf)
        pmin_ref[...] = jnp.full_like(pmin_ref, jnp.inf)

    if apd_navg:
        # detector-binned raw power via the (128, 128) grouping-matrix
        # dot (6-pass, matching the XLA binned_mean_matmul numerics)
        ar = xr_ref[...]
        ai = xi_ref[...]
        p = ar * ar + ai * ai
        dot6 = _make_dot(6)
        pb = dot6(p, gbin_ref[...])
        lane = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        maybe_pbin[0][...] = jnp.where(
            lane < _LANES // apd_navg, pb, jnp.inf
        )

    for rows, dB in _block_dB_slabs(
        xr_ref, xi_ref, wr_ref, wi_ref, bfr_ref, bfi_ref,
        twr_ref, twi_ref, fbr_ref, fbi_ref,
        a=a, passes=passes, interpret=interpret,
    ):
        if emit_levels:
            # histogram level (identical quantization to colhist_pallas.
            # _quantize_uniform so counts match the unfused path)
            idx_ref[rows, :] = jnp.clip(
                jnp.floor((dB - q_lo) * q_scale), 0, n_bins - 1
            ).astype(jnp.int32)

        # per-(k1, k2) stats over this slab's 128/a frames
        red = dB.reshape(_LANES // a, a, _LANES)
        psum_ref[...] += jnp.sum(red, axis=0)
        pmax_ref[...] = jnp.maximum(pmax_ref[...], jnp.max(red, axis=0))
        pmin_ref[...] = jnp.minimum(pmin_ref[...], jnp.min(red, axis=0))


def spectrogram_levels_pallas(
    xr,
    xi,
    w: np.ndarray,
    nfft: int,
    edges_dB: np.ndarray,
    *,
    passes: int = 6,
    apd_navg: int = 0,
    interpret: bool = None,
):
    """fused dB-spectrogram histogram levels + per-bin statistics.

    As spectrogram_dB_pallas, but instead of the dB spectrogram it
    emits (a) each frame/bin's uniform-histogram level index and (b)
    the per-bin sum/max/min of dB accumulated over ALL frames — the
    entire non-histogram content of a persistence fold — so the dB
    frames never round-trip through HBM. Feed the levels to
    columnwise_histogram_packed(levels=...).

    Args: as spectrogram_dB_pallas, plus edges_dB: uniform (n_bins+1,)
    histogram edges (host numpy), or None for a stats-only variant
    that emits no level indices at all (per-bin accumulators are then
    the ONLY HBM writes); apd_navg > 0 (dividing 128) additionally
    emits the detector-binned |x|^2 of the raw stream so a combined
    persistence+APD fold reads the chunk exactly once.

    Returns:
        ([idx,] psum, pmax, pmin[, p_binned]): idx (n // nfft, nfft)
        int32 levels (present when edges_dB is not None);
        psum/pmax/pmin (nfft,) float32 per-bin dB statistics, all in
        FACTORED bin order (flat position k1*128 + k2 holds natural bin
        k2*a + k1); p_binned (n // apd_navg,) float32 detector-binned
        power in time order.
    """
    if interpret is None:
        interpret = not _on_tpu_like()
    n = xr.shape[0]
    if not spectrogram_levels_supported(nfft, n):
        raise ValueError(
            f'unsupported shape: nfft={nfft}, n={n} (need nfft = a*128, '
            f'a a power-of-two multiple of 8 up to 128, '
            f'n % {_ROWS * _LANES} == 0)'
        )
    if apd_navg and (apd_navg < 1 or _LANES % apd_navg):
        raise ValueError('apd_navg must divide 128')
    a = nfft // _LANES

    emit_levels = edges_dB is not None
    if emit_levels:
        edges = np.asarray(edges_dB, dtype='float64')
        widths = np.diff(edges)
        if not np.allclose(widths, widths[0], rtol=1e-6):
            raise ValueError('this kernel requires uniformly spaced edges')
        n_bins = edges.shape[0] - 1
        q_lo = float(np.float32(edges[0]))
        q_scale = float(np.float32(1.0 / widths[0]))
    else:
        n_bins, q_lo, q_scale = 1, 0.0, 1.0

    w_scaled = np.ascontiguousarray((w / nfft).astype('complex64'))
    w_key = w_scaled.tobytes()
    consts = _spg_constants(nfft, w_key)
    if apd_navg:
        from .chan_stats_pallas import _group_matrix

        gbin = _group_matrix(_LANES, apd_navg, 1.0 / apd_navg)
    else:
        gbin = np.zeros((_LANES, _LANES), 'float32')
    consts = consts + (gbin,)

    n_steps = n // (_ROWS * _LANES)

    def vec_spec(c):
        return pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim)

    acc_spec = pl.BlockSpec((a, _LANES), lambda i: (0, 0))
    out_specs, out_shape = [], []
    if emit_levels:
        out_specs.append(pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((n // _LANES, _LANES), jnp.int32)
        )
    out_specs += [acc_spec, acc_spec, acc_spec]
    out_shape += [jax.ShapeDtypeStruct((a, _LANES), jnp.float32)] * 3
    if apd_navg:
        out_specs.append(pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((n // _LANES, _LANES), jnp.float32)
        )

    def _impl(xr, xi):
        outs = pl.pallas_call(
            functools.partial(
                _spg_levels_kernel, a=a, passes=passes, interpret=interpret,
                q_lo=q_lo, q_scale=q_scale, n_bins=n_bins, apd_navg=apd_navg,
                emit_levels=emit_levels,
            ),
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)),
                pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)),
                *[vec_spec(c) for c in consts],
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary',),
            ),
            interpret=interpret,
        )(
            xr.reshape(n // _LANES, _LANES),
            xi.reshape(n // _LANES, _LANES),
            *[jnp.asarray(c) for c in consts],
        )

        i = 0
        result = ()
        if emit_levels:
            result = (outs[0].reshape(n // nfft, nfft),)
            i = 1
        psum, pmax, pmin = outs[i : i + 3]
        result = result + (
            psum.reshape(-1), pmax.reshape(-1), pmin.reshape(-1)
        )
        if apd_navg:
            result = result + (
                outs[i + 3][:, : _LANES // apd_navg].reshape(-1),
            )
        return result

    def _twin(xr, xi):
        # XLA equivalent (differentiation target, grad_fallback): the
        # factored-order dB spectrogram + the same level quantization
        # and reductions, full f32
        dB = _spectrogram_dB_xla(xr, xi, w_scaled, nfft)
        result = ()
        if emit_levels:
            idx = jnp.clip(
                jnp.floor((dB - q_lo) * q_scale), 0, n_bins - 1
            ).astype(jnp.int32)
            result = (idx,)
        result = result + (dB.sum(axis=0), dB.max(axis=0), dB.min(axis=0))
        if apd_navg:
            p = xr * xr + xi * xi
            result = result + (p.reshape(-1, apd_navg).mean(axis=1),)
        return result

    from ._common import grad_fallback

    return grad_fallback(_impl, _twin)(xr, xi)
