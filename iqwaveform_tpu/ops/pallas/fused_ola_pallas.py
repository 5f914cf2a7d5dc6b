"""Pallas TPU kernel: the fused OLA spectral transform in VMEM.

ops.mxu_fft.fused_ola_mxu expresses fft -> zero -> trim -> ifft of each
OLA frame as four complex matmuls in factored (k1, k2) coordinates. Run
through XLA those matmuls round-trip every (M, a, b) intermediate through
HBM — and XLA cannot fuse the twiddle/mask elementwise stages into MXU
dots, so stage profiling (scripts/profile_stages.py) shows the OLA stage
traffic-bound. This kernel keeps the entire per-frame chain — window
multiply, Fa matmul, twiddle, the mask-FOLDED trim+mask+k2-inverse
matmul (H0, ops.mxu_fft._fused_ola_constants_folded — three of the
original four matmul stages remain, with the ≤2 passband-boundary
columns restored by VPU rank-1 corrections), inverse twiddle, Fa_inv
matmul, output shift window — resident in VMEM: HBM sees one (a, b)
frame read and one (a, 2*b2) result write per frame.

Precision: Mosaic lowers only DEFAULT (1-pass bf16, ~4e-3 rel — too
lossy) and HIGHEST (6-pass, ~1.5e-7). The sweet spot is a manual 3-pass
bf16 split (hi/lo decomposition, dropping the lo*lo term — the same
algorithm as XLA's HIGH, which Mosaic does not lower): ~7e-6 RMS vs a
float64 oracle at half the HIGHEST MXU time. Measured on v5e for the
monitor shapes (M=2048, 16384->8192): XLA einsum path 6.3 ms, this
kernel 4.5 ms at HIGHEST, 2.4 ms at 3-pass.

Layout rules for the tunneled Mosaic compiler (see ROADMAP.md): only
BlockSpec-driven 2-D pipelining (frame planes viewed as (M*a, b) f32),
no manual DMA, no fori_loop, block minor dims padded to the 128-lane
tile. In-kernel batched dot_general over T frames per grid step works.
frames_per_block defaults to 8: a v5e sweep at the monitor shapes
(T in {2,4,8,16}) measured 2856/3115/3316/3323 MS/s end-to-end at
3-pass precision — T=8 amortizes the grid overhead and saturates.

Reference semantics: fourier.py:866-924 (downsample_stft) +
fourier.py:1107-1181 (ola_filter) — same math as fused_ola_mxu, which
this kernel is validated against (plus a float64 oracle in
tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ._common import on_tpu_like as _on_tpu_like


from ...utils import lru_cache
from ..mxu_fft import _fused_ola_constants_folded

__all__ = ['fused_ola_pallas', 'fused_ola_pallas_supported', 'fused_ola_packed', 'fused_ola_packed_supported', 'fused_ola_strided', 'fused_ola_strided_supported']

_LANES = 128


def _pad_minor(x: np.ndarray, width: int) -> np.ndarray:
    if x.shape[1] == width:
        return x
    out = np.zeros((x.shape[0], width), x.dtype)
    out[:, : x.shape[1]] = x
    return out


@lru_cache()
def _kernel_constants(
    nfft, nfft_out, zero_lo, zero_hi, in_lo, in_hi, out_lo, w_in_key,
    w_out_key, factors=None,
):
    """host-side constant planes, minor dims padded to the 128-lane tile.

    Uses the mask-FOLDED constants (ops.mxu_fft._fused_ola_constants_
    folded): trim + passband mask + k2-inverse collapse into one H0
    matmul plus ≤2 boundary-column corrections that the kernel evaluates
    as VPU lane reductions — one entire complex matmul stage (1/4 of the
    MXU passes) drops out, bit-exactly.

    w_in_key/w_out_key are hashable bytes snapshots of the input COLA
    window and output shift window so the cache keys stay small.
    """
    (a, b, b2, Fa, W, H0, n_corr, prof, fbcols, vrows, Wp_conj,
     Fa_inv) = _fused_ola_constants_folded(
        nfft, nfft_out, zero_lo, zero_hi, in_lo, in_hi, out_lo, factors
    )
    b2p = max(_LANES, -(-b2 // _LANES) * _LANES)

    w_in = np.frombuffer(w_in_key, dtype='complex64').reshape(a, b)
    w_out = np.frombuffer(w_out_key, dtype='complex64').reshape(a, b2)

    def planes(x):
        x = np.ascontiguousarray(x)
        return x.real.astype('float32'), x.imag.astype('float32')

    consts = []
    consts += planes(w_in)  # war, wai (a, b)
    consts += planes(Fa)  # far, fai (a, a)
    consts += planes(W)  # twr, twi (a, b)
    h0r, h0i = planes(H0)  # (b, b2) -> pad minor
    consts += [_pad_minor(h0r, b2p), _pad_minor(h0i, b2p)]
    # boundary-correction constants, zero-padded to 2 static slots:
    # prof (a, 128) columns 0/1 = k1 profiles; fbc (8, b) rows
    # 0/1/2/3 = Re/Im of the two Fb_kept boundary columns; vrow
    # (8, b2p) rows likewise for the two Fb2_inv boundary rows
    consts += [_pad_minor(prof, _LANES)]
    fbc = np.zeros((8, b), 'float32')
    fbc[0], fbc[1] = fbcols[:, 0].real, fbcols[:, 0].imag
    fbc[2], fbc[3] = fbcols[:, 1].real, fbcols[:, 1].imag
    consts += [fbc]
    vrow = np.zeros((8, b2p), 'float32')
    vrow[0, :b2], vrow[1, :b2] = vrows[0].real, vrows[0].imag
    vrow[2, :b2], vrow[3, :b2] = vrows[1].real, vrows[1].imag
    consts += [vrow]
    wpr, wpi = planes(Wp_conj)  # (a, b2) -> pad minor
    consts += [_pad_minor(wpr, b2p), _pad_minor(wpi, b2p)]
    consts += planes(Fa_inv)  # fir, fii (a, a)
    wsr, wsi = planes(w_out)  # output shift window (a, b2) -> pad minor
    consts += [_pad_minor(wsr, b2p), _pad_minor(wsi, b2p)]
    return a, b, b2, b2p, n_corr, tuple(consts)


def _make_dot(passes: int):
    """batched-aware dot: lhs (..., j) x rhs (j, k) or batched (T, j, k)."""

    def dnums(x, y):
        contract = ((x.ndim - 1,), (1 if y.ndim == 3 else 0,))
        batch = ((0,), (0,)) if y.ndim == 3 else ((), ())
        return (contract, batch)

    if passes in (1, 6):
        prec = (
            jax.lax.Precision.HIGHEST if passes == 6 else jax.lax.Precision.DEFAULT
        )

        def dot(x, y):
            return jax.lax.dot_general(
                x, y, dnums(x, y),
                precision=prec,
                preferred_element_type=jnp.float32,
            )

        return dot

    # 3-pass: hi/lo bf16 split, dropping the lo*lo term — the same
    # algorithm as XLA's HIGH, which Mosaic does not lower natively
    def dot(x, y):
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        yh = y.astype(jnp.bfloat16)
        yl = (y - yh.astype(jnp.float32)).astype(jnp.bfloat16)
        dd = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=dnums(x, y),
            preferred_element_type=jnp.float32,
        )
        return dd(xh, yh) + dd(xh, yl) + dd(xl, yh)

    return dot


def _fused_chain(
    AR, AI, war, wai, far, fai, twr, twi, h0r, h0i, prof, fbc, vrow,
    wpr, wpi, fir, fii, wsr, wsi, *, T, a, b, b2p, passes, n_corr,
):
    """the windowed fft -> mask -> ifft -> shift chain on a (T, a, b)
    frame batch held in VMEM; returns packed (T, a, 2*b2p).

    The mask-folded middle (H0 = trim @ diag(mask) @ k2-inverse,
    ops.mxu_fft._fused_ola_constants_folded) leaves THREE complex
    matmul stages instead of four; the ≤2 passband-boundary columns
    are restored exactly by rank-1 corrections whose thin contractions
    run as f32 VPU lane reductions, never touching the MXU.

    The complex matmul stages use Gauss's 3-multiplication form at
    the 1- and 3-pass tiers (m1 = (xr+xi)@yr, m2 = xr@(yi-yr),
    m3 = xi@(yr+yi); real = m1-m3, imag = m1+m2): 25% fewer MXU passes
    on a pass-bound kernel for a ~sqrt(2) error-constant bump that
    stays inside each tier's accuracy budget (measured: 'high' tier
    RMS vs a float64 oracle stays < 1e-5). The 6-pass HIGHEST tier
    keeps the plain 4-dot form as the accuracy reference."""
    dot = _make_dot(passes)
    gauss = passes != 6

    def bcast(m2d):
        return jnp.broadcast_to(m2d[None], (T,) + m2d.shape)

    def cmul_left(fr_, fi_, xr_, xi_):
        # F @ X, F a constant (a, a) plane batched over the T frames
        if not gauss:
            FR, FI = bcast(fr_), bcast(fi_)
            return dot(FR, xr_) - dot(FI, xi_), dot(FR, xi_) + dot(FI, xr_)
        m1 = dot(bcast(fr_), xr_ + xi_)
        m2 = dot(bcast(fr_ + fi_), xi_)
        m3 = dot(bcast(fi_ - fr_), xr_)
        return m1 - m2, m1 + m3

    def cmul_right(xr_, xi_, yr_, yi_):
        # X @ Y, Y a constant plane
        if not gauss:
            return dot(xr_, yr_) - dot(xi_, yi_), dot(xr_, yi_) + dot(xi_, yr_)
        m1 = dot(xr_ + xi_, yr_)
        m2 = dot(xr_, yi_ - yr_)
        m3 = dot(xi_, yr_ + yi_)
        return m1 - m3, m1 + m2

    # window multiply (complex)
    xr = AR * war[...][None] - AI * wai[...][None]
    xi = AR * wai[...][None] + AI * war[...][None]

    # B = Fa @ X (batched over the T frames in this block)
    br, bi = cmul_left(far[...], fai[...], xr, xi)
    # C = B * W (twiddles)
    cr = br * twr[...][None] - bi * twi[...][None]
    ci = br * twi[...][None] + bi * twr[...][None]
    # Cp = C @ H0: trim, mask, and k2-inverse in ONE matmul
    cpr, cpi = cmul_right(cr, ci, h0r[...], h0i[...])

    if n_corr:
        profv = prof[...]
        fbcv = fbc[...]
        vrowv = vrow[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, profv.shape, 1)
        for s in range(n_corr):
            # d_s = Σ_lanes C ⊙ Fb_kept[:, j_s] — thin contraction on
            # the VPU (full f32, cheaper than any MXU pass)
            fr_ = fbcv[2 * s : 2 * s + 1][None]  # (1, 1, b)
            fi_ = fbcv[2 * s + 1 : 2 * s + 2][None]
            d_r = jnp.sum(cr * fr_ - ci * fi_, axis=2, keepdims=True)
            d_i = jnp.sum(cr * fi_ + ci * fr_, axis=2, keepdims=True)
            p = jnp.sum(
                jnp.where(lane == s, profv, 0.0), axis=1, keepdims=True
            )  # (a, 1)
            pd_r = d_r * p[None]
            pd_i = d_i * p[None]
            vr_ = vrowv[2 * s : 2 * s + 1][None]  # (1, 1, b2p)
            vi_ = vrowv[2 * s + 1 : 2 * s + 2][None]
            cpr = cpr + pd_r * vr_ - pd_i * vi_
            cpi = cpi + pd_r * vi_ + pd_i * vr_

    # Bp = Cp * conj(Wp)
    bpr = cpr * wpr[...][None] - cpi * wpi[...][None]
    bpi = cpr * wpi[...][None] + cpi * wpr[...][None]
    # Ap = Fa_inv @ Bp, then the ISTFT time-shift window
    apr, api = cmul_left(fir[...], fii[...], bpr, bpi)
    onr = apr * wsr[...][None] - api * wsi[...][None]
    oni = apr * wsi[...][None] + api * wsr[...][None]

    # pack real|imag side by side: one write, no padding waste
    return jnp.concatenate([onr, oni], axis=2)


def _fused_ola_kernel(
    ar, ai, war, wai, far, fai, twr, twi, h0r, h0i, prof, fbc, vrow,
    wpr, wpi, fir, fii, wsr, wsi, out,
    *, T, a, b, b2p, passes, n_corr,
):
    AR = ar[...].astype(jnp.float32).reshape(T, a, b)
    AI = ai[...].astype(jnp.float32).reshape(T, a, b)
    packed = _fused_chain(
        AR, AI, war, wai, far, fai, twr, twi, h0r, h0i, prof, fbc, vrow,
        wpr, wpi, fir, fii, wsr, wsi,
        T=T, a=a, b=b, b2p=b2p, passes=passes, n_corr=n_corr,
    )
    out[...] = packed.reshape(T * a, 2 * b2p)


def _fused_ola_strided_kernel(
    lor, hir, loi, hii, halo, war, wai, far, fai, twr, twi, h0r, h0i,
    prof, fbc, vrow, wpr, wpi, fir, fii, wsr, wsi, out, tail, carry,
    *, T, a, b, b2p, passes, n_corr, H, grid,
):
    """framing AND the 2:1 overlap-add fused into the kernel.

    The lo/hi input blocks are row windows of the SAME packed
    [real; imag] plane array: lo covers the step's T*H signal rows, hi
    the next step's first H rows (each signal row fetched once plus an
    H-row peek). On the last grid step the hi window has run off the
    array (its index map clamps), so its content is replaced by the
    ``halo`` operand — the next shard's first hop, or zeros.

    The output is the overlap-ADDED stream: with 2:1 overlap, output
    frame t's first half (H rows) adds to frame t-1's second half, so
    row block t of ``out`` is lo_t + hi_{t-1} — in-block frames chain
    directly and the block seam flows through a VMEM ``carry`` scratch
    (sequential 'arbitrary' grid). The final frame's dangling second
    half lands in ``tail`` for the caller's shard halo exchange (its
    block index map pins every write to block 0; the last write wins).
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        carry[...] = jnp.zeros((H, 2 * b2p), jnp.float32)

    is_last = step == grid - 1
    hi_r = jnp.where(is_last, halo[...][:H].astype(jnp.float32),
                     hir[...].astype(jnp.float32))
    hi_i = jnp.where(is_last, halo[...][H:].astype(jnp.float32),
                     hii[...].astype(jnp.float32))
    full_r = jnp.concatenate([lor[...].astype(jnp.float32), hi_r], axis=0)
    full_i = jnp.concatenate([loi[...].astype(jnp.float32), hi_i], axis=0)
    # ((T+1)*H, b) -> (T, 2H, b) frames by static sublane slices
    AR = jnp.stack([full_r[t * H : t * H + 2 * H] for t in range(T)])
    AI = jnp.stack([full_i[t * H : t * H + 2 * H] for t in range(T)])
    packed = _fused_chain(
        AR, AI, war, wai, far, fai, twr, twi, h0r, h0i, prof, fbc, vrow,
        wpr, wpi, fir, fii, wsr, wsi,
        T=T, a=a, b=b, b2p=b2p, passes=passes, n_corr=n_corr,
    )  # (T, a, 2*b2p) with a == 2*H output rows per frame
    lo_half = packed[:, :H]  # (T, H, 2*b2p)
    hi_half = packed[:, H:]
    # static slices only: negative / dynamic indexing does not lower
    prev = jnp.concatenate([carry[...][None], hi_half[: T - 1]], axis=0)
    out[...] = (lo_half + prev).reshape(T * H, 2 * b2p)
    last = hi_half[T - 1]
    tail[...] = last
    carry[...] = last


def _pick_passes(precision) -> int:
    if precision in ('high', 'i16', jax.lax.Precision.HIGH):
        return 3
    if precision in ('default', 'bf16', jax.lax.Precision.DEFAULT):
        return 1
    return 6


def _storage_dtype(precision):
    """'bf16' additionally stores the frame planes in bfloat16, halving
    the kernel's HBM frame traffic (~4e-3 relative error — opt-in for
    monitoring workloads that only need ~0.05 dB accuracy).

    'i16' stores the planes as int16 raw sample counts with 3-pass
    dots: the same halved frame traffic as 'bf16' but LOSSLESS for
    natively integer captures (SigMF ci16 — the common SDR wire
    format), so accuracy matches the 'high' tier (~7e-6 RMS). The
    caller must supply integer-valued planes (int16, or float32 holding
    integers — .astype(int16) truncates fractions) and fold the ADC
    scale into ``w_in``."""
    if precision == 'bf16':
        return jnp.bfloat16
    if precision == 'i16':
        return jnp.int16
    return jnp.float32


def _to_storage(x, sdt):
    """convert planes to the storage dtype; float -> int16 rounds to
    nearest (astype alone truncates toward zero, which would corrupt
    non-integer-valued float input at the 'i16' tier)."""
    if sdt == jnp.int16 and jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.round(x).astype(sdt)
    return x.astype(sdt)


def fused_ola_pallas_supported(
    nfft: int, nfft_out: int, bounds_in, bounds_out
) -> bool:
    """True when this kernel covers the fused-OLA design: the factored
    math must qualify (ops.mxu_fft.fused_ola_supported) and the frame
    planes' minor dim b must be whole 128-lane tiles (the tunneled
    Mosaic service rejects sub-lane-tile block minors; see the module
    layout rules)."""
    from ..mxu_fft import fused_ola_supported, plan_factors

    if not fused_ola_supported(nfft, nfft_out, bounds_in, bounds_out):
        return False
    _, b = plan_factors(nfft)
    return b % _LANES == 0


def _frame_block(M: int, a: int, frames_per_block: int):
    """pick the per-grid-step frame count ``T`` and zero-frame ``pad``
    for an (M*a, b) frame array so the Mosaic block rule holds: the
    block's second-minor dim (T*a) must be divisible by 8 unless the
    block spans the whole (padded) array. The kernel is strictly
    per-frame, so when no divisor of M satisfies that (small public
    nfft -> a < 8, odd M), pad with zero frames to the next admissible
    multiple; the caller slices them back off. Invariants (pinned by
    tests/test_pallas.py): (M+pad) % T == 0 and ((T*a) % 8 == 0 or
    T == M+pad)."""
    T = max(1, frames_per_block)
    while M % T:
        T //= 2
    pad = 0
    if (T * a) % 8 and T != M:
        k = 8 // gcd(a, 8)  # smallest T with (T*a) % 8 == 0
        T = max(k, max(1, frames_per_block) // k * k)
        pad = (-M) % T
    return T, pad


def fused_ola_pallas(
    frames,
    *,
    nfft: int,
    nfft_out: int,
    zero_lo: int,
    zero_hi,
    bounds_in,
    bounds_out=(0, None),
    w_in: np.ndarray,
    w_shift_out: np.ndarray,
    precision=jax.lax.Precision.HIGHEST,
    frames_per_block: int = 8,
    interpret: bool = None,
):
    """fused OLA spectral transform of a frame batch, windows included.

    Unlike fused_ola_mxu, the input COLA window (``w_in``, complex,
    pre-scaled) and the output shift window (``w_shift_out``) are folded
    into the kernel, so ``frames`` are RAW (unwindowed) OLA frames.

    precision: HIGHEST -> 6-pass bf16 (~1.5e-7 RMS vs float64), 'high'
    -> manual 3-pass split (~7e-6 RMS, ~2x faster), DEFAULT -> 1-pass
    (~4e-3 — experiments only).

    frames: (M, nfft) complex64 -> (M, nfft_out) complex64.
    """
    if interpret is None:
        # no TPU lowering target -> emulate (keeps CPU tests/virtual
        # meshes working with the same call sites)
        interpret = not _on_tpu_like()
    in_lo, in_hi = bounds_in
    w_in = np.asarray(w_in, dtype='complex64')
    w_out = np.asarray(w_shift_out, dtype='complex64')
    a, b, b2, b2p, n_corr, consts = _kernel_constants(
        nfft, nfft_out, int(zero_lo), zero_hi, int(in_lo), int(in_hi),
        int(bounds_out[0]), w_in.tobytes(), w_out.tobytes(),
    )

    M = frames.shape[0]
    T, pad = _frame_block(M, a, frames_per_block)
    Mp = M + pad
    if pad:
        frames = jnp.pad(frames, ((0, pad), (0, 0)))
    sdt = _storage_dtype(precision)
    fr = _to_storage(frames.real, sdt).reshape(Mp * a, b)
    fi = _to_storage(frames.imag, sdt).reshape(Mp * a, b)

    frame_spec = pl.BlockSpec((T * a, b), lambda m: (m, 0))
    out_spec = pl.BlockSpec((T * a, 2 * b2p), lambda m: (m, 0))

    def const_spec(c):
        return pl.BlockSpec(c.shape, lambda m: (0, 0))

    packed = pl.pallas_call(
        functools.partial(
            _fused_ola_kernel,
            T=T, a=a, b=b, b2p=b2p, passes=_pick_passes(precision),
            n_corr=n_corr,
        ),
        grid=(Mp // T,),
        in_specs=[frame_spec, frame_spec] + [const_spec(c) for c in consts],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Mp * a, 2 * b2p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
        ),
        interpret=interpret,
    )(fr, fi, *consts)

    out = jax.lax.complex(packed[:, :b2], packed[:, b2p : b2p + b2])
    return out.reshape(Mp, nfft_out)[:M]


# ---- packed-planes variant: output rows ARE 128-sample time rows ----


def _packed_factors(nfft: int, nfft_out: int):
    """factor split a = nfft_out/128 so the inverse transform's factored
    output (a, b2) has b2 = 128 exactly: each output row holds 128
    consecutive time samples, so the packed [real|imag] buffer feeds the
    channelizer kernel and the row-shifted overlap-add directly."""
    a = nfft_out // _LANES
    return a, nfft // a


def fused_ola_packed_supported(
    nfft: int, nfft_out: int, bounds_in, bounds_out
) -> bool:
    if nfft_out % _LANES or nfft_out > nfft:
        return False
    a, b = _packed_factors(nfft, nfft_out)
    if a < 8 or a % 8 or nfft % a or b % _LANES:
        return False
    in_start = bounds_in[0] - bounds_out[0]
    return in_start >= 0 and in_start + nfft_out <= nfft and in_start % a == 0


def fused_ola_packed(
    fr,
    fi,
    *,
    nfft: int,
    nfft_out: int,
    zero_lo: int,
    zero_hi,
    bounds_in,
    bounds_out=(0, None),
    w_in: np.ndarray,
    w_shift_out: np.ndarray,
    precision=jax.lax.Precision.HIGHEST,
    frames_per_block: int = 8,
    interpret: bool = None,
):
    """fused OLA spectral transform on float32 planes, packed output.

    fr, fi: (M, nfft) float32 raw (unwindowed) OLA frame planes.
    Returns (M * nfft_out/128, 256) float32: row r holds output samples
    [128*r, 128*r + 128) of frame r // (nfft_out/128), real in columns
    0:128 and imag in 128:256 — the layout chan_stats_pallas and the
    row-shifted overlap-add consume with no complex materialization.
    """
    if interpret is None:
        interpret = not _on_tpu_like()
    in_lo, in_hi = bounds_in
    a, b = _packed_factors(nfft, nfft_out)
    w_in = np.asarray(w_in, dtype='complex64')
    w_out = np.asarray(w_shift_out, dtype='complex64')
    a_, b_, b2, b2p, n_corr, consts = _kernel_constants(
        nfft, nfft_out, int(zero_lo), zero_hi, int(in_lo), int(in_hi),
        int(bounds_out[0]), w_in.tobytes(), w_out.tobytes(), (a, b),
    )
    assert (a_, b_, b2, b2p) == (a, b, _LANES, _LANES)

    M = fr.shape[0]
    T = max(1, frames_per_block)
    while M % T:
        T //= 2
    sdt = _storage_dtype(precision)
    fr = _to_storage(fr, sdt).reshape(M * a, b)
    fi = _to_storage(fi, sdt).reshape(M * a, b)

    frame_spec = pl.BlockSpec((T * a, b), lambda m: (m, 0))
    out_spec = pl.BlockSpec((T * a, 2 * _LANES), lambda m: (m, 0))

    def const_spec(c):
        return pl.BlockSpec(c.shape, lambda m: (0, 0))

    return pl.pallas_call(
        functools.partial(
            _fused_ola_kernel,
            T=T, a=a, b=b, b2p=_LANES, passes=_pick_passes(precision),
            n_corr=n_corr,
        ),
        grid=(M // T,),
        in_specs=[frame_spec, frame_spec] + [const_spec(c) for c in consts],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((M * a, 2 * _LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
        ),
        interpret=interpret,
    )(fr, fi, *consts)


def fused_ola_strided_supported(
    nfft: int, nfft_out: int, hop_in: int, bounds_in, bounds_out
) -> bool:
    """the strided variant additionally requires 2:1 frame overlap
    (nfft = 2*hop_in) with hop_in a whole number of b-lane rows, so each
    frame is exactly two consecutive input blocks."""
    if not fused_ola_packed_supported(nfft, nfft_out, bounds_in, bounds_out):
        return False
    a, b = _packed_factors(nfft, nfft_out)
    return nfft == 2 * hop_in and hop_in % b == 0 and a % 2 == 0


def fused_ola_strided(
    planes,
    halo,
    *,
    n_frames: int,
    hop_in: int,
    nfft: int,
    nfft_out: int,
    zero_lo: int,
    zero_hi,
    bounds_in,
    bounds_out=(0, None),
    w_in: np.ndarray,
    w_shift_out: np.ndarray,
    precision=jax.lax.Precision.HIGHEST,
    frames_per_block: int = 16,
    interpret: bool = None,
):
    """fused OLA with framing AND the 2:1 overlap-add inside the kernel.

    frames_per_block default 16: a v5e sweep at the flagship monitor
    shape ('high' tier, T in {4,8,16,32}) measured 2.52/2.38/2.32/2.30
    ms — the H-row peek and carry seam amortize with T, flat past 16.

    planes: (2, n_frames * hop_in) raw [real, imag] sample planes
    (float32, or int16/bfloat16 at those storage tiers). Reaching past
    the end, the final frame's second hop is ``halo``: (2, hop_in) —
    the next shard's first hop, or zeros. Nothing is copied on the way
    in: the kernel reads both planes and both frame halves of the SAME
    (2*rows, b) reshape through four block index maps, so HBM sees each
    sample once (plus an H-row peek per block and the halo operand).

    Returns (y, tail): y is (n_frames * hop_out/128, 256) packed planes
    of the overlap-ADDED output stream (hop_out = nfft_out/2; real in
    columns 0:128, imag in 128:256); tail is the final frame's dangling
    second half, (hop_out/128, 256) — add it (shard-halo-exchanged) to
    the next chunk's first rows, or drop it to match a one-shot OLA
    trimmed to n_frames * hop_out samples.
    """
    if interpret is None:
        interpret = not _on_tpu_like()
    in_lo, in_hi = bounds_in
    a, b = _packed_factors(nfft, nfft_out)
    H = hop_in // b  # input rows per hop; frame = 2 consecutive hops
    w_in = np.asarray(w_in, dtype='complex64')
    w_out = np.asarray(w_shift_out, dtype='complex64')
    a_, b_, b2, b2p, n_corr, consts = _kernel_constants(
        nfft, nfft_out, int(zero_lo), zero_hi, int(in_lo), int(in_hi),
        int(bounds_out[0]), w_in.tobytes(), w_out.tobytes(), (a, b),
    )
    assert (a_, b_, b2, b2p) == (a, b, _LANES, _LANES) and a == 2 * H

    M = n_frames
    T = max(1, frames_per_block)
    while M % T:
        T //= 2
    G = M // T

    sdt = _storage_dtype(precision)
    x2 = _to_storage(planes, sdt).reshape(2 * M * H, b)
    h2 = _to_storage(halo, sdt).reshape(2 * H, b)

    # four views of the same array: {real, imag} x {T*H-row lo window,
    # H-row peek at the next window}. The peek's index map clamps on
    # the final step (the kernel swaps in the halo operand there), and
    # the imag plane sits at row-block offset G (lo units) / M (peek
    # units) of the packed [real; imag] stack.
    lo_r = pl.BlockSpec((T * H, b), lambda m: (m, 0))
    lo_i = pl.BlockSpec((T * H, b), lambda m: (G + m, 0))
    hi_r = pl.BlockSpec((H, b), lambda m: (jnp.minimum((m + 1) * T, M - 1), 0))
    hi_i = pl.BlockSpec(
        (H, b), lambda m: (M + jnp.minimum((m + 1) * T, M - 1), 0)
    )
    out_spec = pl.BlockSpec((T * H, 2 * _LANES), lambda m: (m, 0))
    tail_spec = pl.BlockSpec((H, 2 * _LANES), lambda m: (0, 0))

    def const_spec(c):
        return pl.BlockSpec(c.shape, lambda m: (0, 0))

    return pl.pallas_call(
        functools.partial(
            _fused_ola_strided_kernel,
            T=T, a=a, b=b, b2p=_LANES, passes=_pick_passes(precision),
            n_corr=n_corr, H=H, grid=G,
        ),
        grid=(G,),
        in_specs=[lo_r, hi_r, lo_i, hi_i, const_spec(h2)]
        + [const_spec(c) for c in consts],
        out_specs=[out_spec, tail_spec],
        out_shape=[
            jax.ShapeDtypeStruct((M * H, 2 * _LANES), jnp.float32),
            jax.ShapeDtypeStruct((H, 2 * _LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((H, 2 * _LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
        ),
        interpret=interpret,
    )(x2, x2, x2, x2, h2, *consts)
