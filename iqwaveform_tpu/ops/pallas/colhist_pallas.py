"""Pallas TPU kernel: per-column histograms as hi/lo one-hot matmuls.

The persistence spectrum needs a histogram per frequency bin over the
frame axis (counts[f, b] = #frames whose dB level falls in bin b). The
sort+searchsorted formulation (parallel.sharded.columnwise_histogram) is
the scatter-free XLA baseline, but at production shapes (16384 frames x
1024 freqs x 1024 bins) it costs ~210 ms/chunk on a v5e chip — it
dominates the streaming pipeline (BASELINE config #3).

This kernel reformulates counting as MXU work. With uniform bins the
level index splits as b = G*hi + lo, so

    counts[f, G*i + j] = sum_t [hi[f, t] == i] * [lo[f, t] == j]
                       = sum_t H[f, t, i] * L[f, t, j]

— for each frequency a (G, T) @ (T, G) matmul of one-hot factor
matrices, batched over the 128 frequencies of a block. The one-hot
factors hold exact 0/1, so counts are exact with either factor dtype:
the default int8 (int32 accumulation on the MXU's int path, 26 ms at
the shapes above) or bfloat16 with float32 accumulation
(factor_dtype=jnp.bfloat16, 34 ms — the fallback if a backend rejects int8
dots). No sort, no gather, no scatter; in-kernel ops are broadcast-iota
compares and one batched dot_general (the BlockSpec style the tunneled
Mosaic service compiles). Measured 26 ms vs 208 ms for the sort path
(8x; the kernel is MXU-bound at B MACs per element, so halving the bin
count halves it again).

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


__all__ = ['columnwise_histogram_fast', 'columnwise_histogram_pallas']

_LANES = 128
_G = 32  # lo-group size; bins pad to a multiple of _G


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

    acc_dtype = jnp.int32 if factor_dtype == jnp.int8 else jnp.float32
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
    edges = np.asarray(edges, dtype='float64')
    B = edges.shape[0] - 1
    widths = np.diff(edges)
    if not np.allclose(widths, widths[0], rtol=1e-6):
        raise ValueError('this kernel requires uniformly spaced edges')

    T, F = vals.shape
    G_hi = _round_up(B, _G) // _G
    F_p = _round_up(F, _LANES)
    T_p = _round_up(T, time_block)

    # quantize to integer levels on the XLA side (fused elementwise);
    # clip semantics match the sort-based formulation
    scale = np.float32(1.0 / widths[0])
    lo_edge = np.float32(edges[0])
    idx = jnp.clip(
        jnp.floor((vals.astype(jnp.float32) - lo_edge) * scale), 0, B - 1
    ).astype(jnp.int32)

    # transpose to (freq, time) so frequency rides the batch/sublane dims
    # (one XLA transpose outside the kernel); pad with the zero-count
    # sentinel level G_hi * G
    sentinel = G_hi * _G
    idx = jnp.pad(
        idx.T, ((0, F_p - F), (0, T_p - T)), constant_values=sentinel
    )

    out = pl.pallas_call(
        functools.partial(
            _colhist_kernel,
            Tb=time_block,
            G=_G,
            G_hi=G_hi,
            factor_dtype=factor_dtype,
        ),
        grid=(F_p // _LANES, T_p // time_block),
        in_specs=[
            pl.BlockSpec((_LANES, time_block), lambda f, t: (f, t)),
        ],
        out_specs=pl.BlockSpec(
            (_LANES, G_hi, _G), lambda f, t: (f, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((F_p, G_hi, _G), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary'),
        ),
        interpret=interpret,
    )(idx)

    return out.reshape(F_p, G_hi * _G)[:F, :B].astype(jnp.int32)


def columnwise_histogram_fast(vals, edges):
    """auto dispatch: the one-hot-matmul kernel on a real TPU target with
    uniform edges, the sort+searchsorted XLA path otherwise."""
    edges_np = np.asarray(edges, dtype='float64')
    widths = np.diff(edges_np)
    uniform = np.allclose(widths, widths[0], rtol=1e-6)
    if uniform and _on_tpu_like():
        return columnwise_histogram_pallas(vals, edges)

    from ...parallel.sharded import columnwise_histogram

    return columnwise_histogram(vals, edges)
