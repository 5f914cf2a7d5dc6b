"""Pallas TPU kernel: per-column histograms as hi/lo one-hot matmuls.

The persistence spectrum needs a histogram per frequency bin over the
frame axis (counts[f, b] = #frames whose dB level falls in bin b). The
sort+searchsorted formulation (parallel.sharded.columnwise_histogram) is
the scatter-free XLA baseline, but at production shapes (16384 frames x
1024 freqs x 1024 bins) it costs ~210 ms/chunk on a v5e chip — it
dominates the streaming pipeline (BASELINE config #3).

These kernels reformulate counting as MXU work. With uniform bins the
level index splits as b = G*hi + lo, so

    counts[f, G*i + j] = sum_t [hi[f, t] == i] * [lo[f, t] == j]
                       = sum_t H[f, t, i] * L[f, t, j]

— a matmul of one-hot factor matrices, contracting time. The one-hot
factors hold exact 0/1, so counts are exact with either factor dtype
(int8 with int32 MXU accumulation, or bfloat16 with float32). No sort,
no gather, no scatter; in-kernel ops are broadcast-iota compares,
sublane tile-repeats, and dot_general (the BlockSpec style the
tunneled Mosaic service compiles).

Two formulations, measured at (16384 x 1024) x 1024 bins on a v5e:

- columnwise_histogram_pallas: per-frequency batched (G_hi, T)@(T, G)
  dots. 18.7 ms — and FLAT in G (18.7-22.8 ms across G in {8..128}):
  each small per-frequency dot costs a full MXU pipeline pass however
  few lanes it fills, so the kernel is pass-floor bound at ~1 pass per
  (frequency, 128-sample time chunk), not MAC bound.
- columnwise_histogram_packed: packs a SLAB of 8 frequencies into each
  128x128 output tile (factor rows cycle the slab's frequencies while
  16 'copies' enumerate hi/lo levels; quadrant dots cover the level
  grid; cross-frequency cells are discarded host-side). 2.9 ms at 1024
  bins (6.5x), 0.4-0.8 ms at <=512 bins, vs 208 ms for the XLA sort
  path (~70x).

Reference context: the reference has no streaming persistence histogram
(its xp.quantile persistence stack is in-memory, fourier.py:1311-1326);
this kernel is TPU infrastructure for SURVEY.md §5's streaming
reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ._common import on_tpu_like as _on_tpu_like, round_up as _round_up


__all__ = [
    'columnwise_histogram_fast',
    'columnwise_histogram_pallas',
    'columnwise_histogram_packed',
    'columnwise_histogram_packed_raw',
    'packed_plan',
    'unpack_packed_counts',
    'unpack_packed_counts_total',
]

_LANES = 128
_G = 32  # lo-group size; bins pad to a multiple of _G
_SLAB = 8  # packed kernel: frequencies co-resident in one MXU pass group
_COPIES = _LANES // _SLAB  # 16 hi/lo levels per factor quadrant


def _colhist_kernel(idx_ref, out_ref, *, Tb, G, G_hi, factor_dtype):
    """idx block (128, Tb) int32 -> accumulate (128, G_hi, G) counts."""
    t = pl.program_id(1)

    idx = idx_ref[...]  # (128, Tb)
    hi = idx // G
    lo = idx - hi * G

    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, G_hi), 2)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (1, 1, G), 2)
    # one-hot factors, exact 0/1 (sentinel hi == G_hi matches nothing,
    # so padding rows contribute zero); int8 doubles native MXU rate
    H = (hi[:, :, None] == iota_hi).astype(factor_dtype)  # (128, Tb, G_hi)
    L = (lo[:, :, None] == iota_lo).astype(factor_dtype)  # (128, Tb, G)

    acc_dtype = (
        jnp.int32
        if jnp.issubdtype(jnp.dtype(factor_dtype), jnp.integer)
        else jnp.float32
    )
    # counts[f, i, j] = sum_t H[f, t, i] L[f, t, j]
    tile = jax.lax.dot_general(
        H,
        L,
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=acc_dtype,
    ).astype(jnp.float32)  # (128, G_hi, G)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += tile


def columnwise_histogram_pallas(
    vals,
    edges,
    *,
    time_block: int = 128,
    factor_dtype=jnp.int8,
    group: int = _G,
    interpret: bool = None,
):
    """per-column histogram of ``vals`` (rows, cols) over UNIFORM ``edges``
    -> (cols, n_bins) int32 counts, bin b covering [e_b, e_{b+1}) with
    out-of-range values clipped into the end bins.

    Counts match parallel.sharded.columnwise_histogram except that a
    sample within float32 rounding of a bin edge may land in the
    adjacent bin (assignment here is the uniform quantization
    floor((v - e_0)/width) rather than a searchsorted against the
    individually rounded edges). Totals are always exact.
    """
    if interpret is None:
        interpret = not _on_tpu_like()

    # quantize to integer levels on the XLA side (fused elementwise);
    # clip semantics match the sort-based formulation
    idx, B = _quantize_uniform(vals, edges)

    T, F = vals.shape
    G_hi = _round_up(B, group) // group
    F_p = _round_up(F, _LANES)
    T_p = _round_up(T, time_block)

    # transpose to (freq, time) so frequency rides the batch/sublane dims
    # (one XLA transpose outside the kernel); pad with the zero-count
    # sentinel level G_hi * G
    sentinel = G_hi * group
    idx = jnp.pad(
        idx.T, ((0, F_p - F), (0, T_p - T)), constant_values=sentinel
    )

    out = pl.pallas_call(
        functools.partial(
            _colhist_kernel,
            Tb=time_block,
            G=group,
            G_hi=G_hi,
            factor_dtype=factor_dtype,
        ),
        grid=(F_p // _LANES, T_p // time_block),
        in_specs=[
            pl.BlockSpec((_LANES, time_block), lambda f, t: (f, t)),
        ],
        out_specs=pl.BlockSpec(
            (_LANES, G_hi, group), lambda f, t: (f, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((F_p, G_hi, group), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary'),
        ),
        interpret=interpret,
    )(idx)

    return out.reshape(F_p, G_hi * group)[:F, :B].astype(jnp.int32)


def _quantize_uniform(vals, edges):
    """uniform-bin level index of each value, clipped into end bins.
    Returns (idx int32 array, n_bins)."""
    edges = np.asarray(edges, dtype='float64')
    B = edges.shape[0] - 1
    widths = np.diff(edges)
    if not np.allclose(widths, widths[0], rtol=1e-6):
        raise ValueError('this kernel requires uniformly spaced edges')
    scale = np.float32(1.0 / widths[0])
    lo_edge = np.float32(edges[0])
    idx = jnp.clip(
        jnp.floor((vals.astype(jnp.float32) - lo_edge) * scale), 0, B - 1
    ).astype(jnp.int32)
    return idx, B


def _rep_rows(x, n, interpret):
    """concatenate ``n`` copies of ``x`` along the sublane axis."""
    if interpret:
        return jnp.concatenate([x] * n, axis=0)
    return pltpu.repeat(x, n, axis=0)


def _colhist_packed_kernel(
    idx_ref, out_ref, *, Tb, G, G_hi, QI, QJ, slab_size, factor_dtype, interpret
):
    """idx block (128, Tb) int32 -> raw (slab, quadrant) count tiles.

    Packs ``slab_size`` frequencies into every MXU pass: the
    per-frequency formulation issues one (G_hi, Tb)x(Tb, G) pass per
    frequency per time chunk and is pass-floor bound (~134 cycles/pass
    measured regardless of G — the systolic array charges a full
    pipeline pass for any output tile up to 128x128). Here one dot
    computes a full (128, 128) tile holding slab_size frequencies'
    partial histograms: factor rows cycle through the slab's
    frequencies (sublane tile-repeat) while the copy index enumerates
    128/slab_size hi (or lo) levels, so with C = 128/slab_size, tile
    [c*slab+p, d*slab+p] = count(f, hi=qi*C+c, lo=qj*C+d). The p != p'
    cross-frequency cells are discarded host-side.

    Passes per (freq block, time chunk) = (128/slab_size)*QI*QJ;
    _pick_slab minimizes this over the power-of-two slab sizes (e.g. at
    1024 bins slab 4 x 32 copies runs QI=QJ=1 -> 32 passes, half the
    slab-8 64; at 256 bins slab 8 stays optimal at 16)."""
    t = pl.program_id(1)
    copies = _LANES // slab_size
    n_slabs = idx_ref.shape[0] // slab_size

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # copy index c in [0, copies) of each factor row
    code = jax.lax.broadcasted_iota(jnp.int32, (_LANES, Tb), 0) // slab_size
    acc_dtype = (
        jnp.int32
        if jnp.issubdtype(jnp.dtype(factor_dtype), jnp.integer)
        else jnp.float32
    )

    for s in range(n_slabs):
        slab = idx_ref[s * slab_size : (s + 1) * slab_size, :]  # (slab, Tb)
        hi = slab // G
        lo = slab - hi * G
        rep_hi = _rep_rows(hi, copies, interpret)  # (128, Tb)
        rep_lo = _rep_rows(lo, copies, interpret)
        for qi in range(QI):
            Hq = (rep_hi == code + copies * qi).astype(factor_dtype)
            for qj in range(QJ):
                Lq = (rep_lo == code + copies * qj).astype(factor_dtype)
                # contract the shared time lanes of both factors
                tile = jax.lax.dot_general(
                    Hq,
                    Lq,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dtype,
                ).astype(jnp.float32)  # (128, 128)
                r = ((s * QI + qi) * QJ + qj) * _LANES
                out_ref[r : r + _LANES, :] += tile


@functools.lru_cache()
def _pick_slab(B: int):
    """minimize MXU passes per (freq block, time chunk) over power-of-two
    slab sizes: passes = (128/slab) * QI * QJ with QI*QJ the smallest
    power-of-two product where QI*QJ*(128/slab)^2 >= B. Returns
    (slab, QI, QJ)."""
    best = None
    for slab in (1, 2, 4, 8, 16, 32, 64):
        copies = _LANES // slab
        QI = QJ = 1
        while QI * QJ * copies * copies < B:
            if QJ <= QI:
                QJ *= 2
            else:
                QI *= 2
        passes = (_LANES // slab) * QI * QJ
        if best is None or passes < best[0]:
            best = (passes, slab, QI, QJ)
    return best[1], best[2], best[3]


def packed_plan(B: int, F: int, slab_size: int = None) -> dict:
    """host-side plan for the packed counting kernel's raw tile layout:
    quadrant factoring (slab, QI, QJ, copies, G_hi, G) and the raw
    accumulator shape for ``F`` columns. The raw representation is what
    a streaming fold should CARRY (raw tiles add elementwise across
    chunks); unpack_packed_counts extracts counts once at readout —
    the per-chunk diagonal extraction otherwise dominates the kernel
    ~2.5:1 (XLA lowers the strided diagonal gather far slower than the
    32 MXU counting passes; measured round 4)."""
    slab = slab_size
    if slab is None:
        slab, QI, QJ = _pick_slab(B)
    else:
        copies = _LANES // slab
        QI = QJ = 1
        while QI * QJ * copies * copies < B:
            if QJ <= QI:
                QJ *= 2
            else:
                QI *= 2
    copies = _LANES // slab
    F_p = _round_up(F, _LANES)
    rows_per_fblock = (_LANES // slab) * QI * QJ * _LANES
    return {
        'B': B,
        'F': F,
        'F_p': F_p,
        'slab': slab,
        'QI': QI,
        'QJ': QJ,
        'copies': copies,
        'G_hi': QI * copies,
        'G': QJ * copies,
        'raw_shape': (F_p // _LANES * rows_per_fblock, _LANES),
    }


def columnwise_histogram_packed_raw(
    vals=None,
    edges=None,
    *,
    time_block: int = 128,
    factor_dtype=jnp.bfloat16,
    interpret: bool = None,
    levels: tuple = None,
    plan: dict = None,
):
    """packed counting kernel WITHOUT the diagonal readout: returns the
    raw float32 quadrant tile stack of shape ``plan['raw_shape']``. Raw
    tiles are exact integer-valued counts and add elementwise across
    calls, so a streaming fold can accumulate them directly and extract
    (unpack_packed_counts) once at readout. Exact to 2**24 counts per
    cell (f32 integer range) — flush before any cell can exceed it.
    """
    if interpret is None:
        interpret = not _on_tpu_like()

    if levels is not None:
        idx, B = levels
    else:
        idx, B = _quantize_uniform(vals, edges)

    T, F = idx.shape
    if plan is None:
        plan = packed_plan(B, F)
    assert plan['B'] == B and plan['F'] == F
    slab, QI, QJ = plan['slab'], plan['QI'], plan['QJ']
    G_hi, G, F_p = plan['G_hi'], plan['G'], plan['F_p']
    T_p = _round_up(T, time_block)
    rows_per_fblock = (_LANES // slab) * QI * QJ * _LANES

    def _impl(idx2):
        sentinel = G_hi * G  # hi == G_hi matches no quadrant row
        padded = jnp.pad(
            idx2.T, ((0, F_p - F), (0, T_p - T)), constant_values=sentinel
        )
        return pl.pallas_call(
            functools.partial(
                _colhist_packed_kernel,
                Tb=time_block,
                G=G,
                G_hi=G_hi,
                QI=QI,
                QJ=QJ,
                slab_size=slab,
                factor_dtype=factor_dtype,
                interpret=interpret,
            ),
            grid=(F_p // _LANES, T_p // time_block),
            in_specs=[
                pl.BlockSpec((_LANES, time_block), lambda f, t: (f, t)),
            ],
            out_specs=pl.BlockSpec(
                (rows_per_fblock, _LANES), lambda f, t: (f, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(plan['raw_shape'], jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('parallel', 'arbitrary'),
            ),
            interpret=interpret,
        )(padded)

    def _twin(idx2):
        # XLA twin under differentiation (grad_fallback): sort-path
        # counts of the (already clipped) levels, embedded into the raw
        # tile layout. Counts have zero tangents either way.
        s = jnp.sort(idx2, axis=0)
        bounds = jnp.arange(B + 1, dtype=idx2.dtype)
        cum = jax.vmap(
            lambda col: jnp.searchsorted(col, bounds, side='left'),
            in_axes=1,
        )(s)
        counts = jnp.diff(cum, axis=1).astype(jnp.int32)  # (F, B)
        return embed_counts_raw(counts, plan)

    from ._common import grad_fallback

    return grad_fallback(_impl, _twin)(idx)


def embed_counts_raw(counts, plan: dict):
    """(F, B) counts -> the raw quadrant tile layout (diagonal cells
    filled, cross-frequency cells zero); the exact right inverse of
    unpack_packed_counts. Serves as the XLA twin of the raw kernel
    under differentiation (grad_fallback): same output layout, counts
    from the sort path."""
    slab, QI, QJ = plan['slab'], plan['QI'], plan['QJ']
    copies, F_p = plan['copies'], plan['F_p']
    c_pad = (
        jnp.zeros((F_p, plan['G_hi'] * plan['G']), jnp.float32)
        .at[: plan['F'], : plan['B']]
        .set(counts.astype(jnp.float32))
    )
    d7 = c_pad.reshape(
        F_p // _LANES, _LANES // slab, slab, QI, copies, QJ, copies
    )  # dims f, s, p, i, c, j, d — inverse of unpack's diag reshape
    raw8 = jnp.einsum(
        'fspicjd,pq->fsijcpdq', d7, jnp.eye(slab, dtype=jnp.float32)
    )
    return raw8.reshape(plan['raw_shape'])


def unpack_packed_counts(raw, plan: dict):
    """raw quadrant tiles -> (F, B) int32 counts: tile
    [c*slab+p, d*slab+p'] is only meaningful on the frequency diagonal
    p == p'; run ONCE at readout, not per chunk."""
    slab, QI, QJ = plan['slab'], plan['QI'], plan['QJ']
    copies, F_p = plan['copies'], plan['F_p']
    o = raw.reshape(
        F_p // _LANES,
        _LANES // slab,
        QI,
        QJ,
        copies,
        slab,
        copies,
        slab,
    )
    diag = jnp.einsum('fsijcpdp->fspicjd', o)
    counts = diag.reshape(F_p, plan['G_hi'] * plan['G'])
    return counts[: plan['F'], : plan['B']].astype(jnp.int32)


def unpack_packed_counts_total(raw, plan: dict):
    """raw quadrant tiles -> (B,) int32 COLUMN-SUMMED counts (the 1-D
    histogram of all columns together). Algebraically collapses the
    diagonal extraction and the column sum into one tiny contraction
    against an identity matrix — XLA lowers this as a dense reduce
    instead of the strided diagonal gather, ~an order of magnitude
    cheaper than unpack_packed_counts(...).sum(axis=0). Padding columns
    must carry the sentinel level (they then count into no real bin)."""
    slab, QI, QJ = plan['slab'], plan['QI'], plan['QJ']
    copies, F_p = plan['copies'], plan['F_p']
    o = raw.reshape(
        F_p // _LANES,
        _LANES // slab,
        QI,
        QJ,
        copies,
        slab,
        copies,
        slab,
    )
    eye = jnp.eye(slab, dtype=raw.dtype)
    tot = jnp.einsum('fsijcpdq,pq->icjd', o, eye)
    return tot.reshape(plan['G_hi'] * plan['G'])[: plan['B']].astype(
        jnp.int32
    )


def columnwise_histogram_packed(
    vals=None,
    edges=None,
    *,
    time_block: int = 128,
    factor_dtype=jnp.bfloat16,
    slab_size: int = None,
    interpret: bool = None,
    levels: tuple = None,
):
    """per-column histogram of ``vals`` (rows, cols) over UNIFORM
    ``edges`` -> (cols, n_bins) int32 counts; same contract as
    columnwise_histogram_pallas but measured 6.5x faster at 1024 bins
    at the fixed slab of 8 — and the pass-minimizing slab (_pick_slab;
    e.g. 4 x 32 copies at 1024 bins) halves the MXU passes again.
    Bin-edge rounding caveat as the unpacked kernel: totals exact, a
    sample within float32 rounding of an edge may land one bin over.

    ``levels``: pass (idx, B) to count PRE-QUANTIZED int32 level
    indices (e.g. emitted by the fused spectrogram kernel) instead of
    quantizing ``vals`` here; ``vals``/``edges`` are then ignored for
    values and only ``idx`` (rows, cols) is read.

    Streaming folds should prefer columnwise_histogram_packed_raw and
    carry the raw tiles (unpack once at readout): the diagonal
    extraction here costs ~2.5x the counting kernel itself per call.
    """
    if levels is not None:
        _, B = levels
        F = levels[0].shape[1]
    else:
        B = np.asarray(edges).shape[0] - 1
        F = vals.shape[1]
    plan = packed_plan(B, F, slab_size)
    raw = columnwise_histogram_packed_raw(
        vals,
        edges,
        time_block=time_block,
        factor_dtype=factor_dtype,
        interpret=interpret,
        levels=levels,
        plan=plan,
    )
    return unpack_packed_counts(raw, plan)


def columnwise_histogram_fast(vals, edges):
    """auto dispatch: the packed one-hot-matmul kernel on a real TPU
    target with uniform edges (<=1024 bins; the unpacked kernel above
    that), the sort+searchsorted XLA path otherwise. Differentiation
    always dispatches to the XLA path (grad_fallback): counts have zero
    tangents, but the kernels define no JVP rules."""
    edges_np = np.asarray(edges, dtype='float64')
    widths = np.diff(edges_np)
    uniform = np.allclose(widths, widths[0], rtol=1e-6)

    from ...parallel.sharded import columnwise_histogram

    if uniform and _on_tpu_like():
        B = edges_np.shape[0] - 1
        # the packed kernel is measured/validated on-chip to 1024 bins;
        # beyond that its unrolled quadrant dots and VMEM output block
        # grow linearly in B (16 MB at 4096), so use the unpacked kernel
        kernel = (
            columnwise_histogram_packed
            if B <= 1024
            else columnwise_histogram_pallas
        )
        from ._common import grad_fallback

        return grad_fallback(
            lambda v: kernel(v, edges),
            lambda v: columnwise_histogram(v, edges),
        )(vals)

    return columnwise_histogram(vals, edges)
