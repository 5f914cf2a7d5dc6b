"""Pallas TPU kernel: cyclic-prefix correlation at index sets.

The TPU-native equivalent of the reference's numba CPU / numba-CUDA
gather-MAC kernels (_jit/cpu.py:6-42, _jit/cuda.py:7-43 — C16 in
SURVEY.md §2). The CUDA kernel assigns one output lag per thread and
iterates all cp sample indices; this kernel instead uses the O(N)
moving-sum identity (see models.ofdm.corr_at_indices):

    out[j] = sum_s movsum(z, ncp)[start_s + j],   z[t] = x[t] conj(x[t+nfft])

Per (lag-tile, start) step it DMAs two complex slabs from HBM, forms the
lag product and its ncp-wide running sum with a cumulative sum in VMEM,
and accumulates the window into the tile — vector work on the VPU with no
per-sample gathers.

The production path is the pure-XLA formulation in models.ofdm (identical
math, XLA-scheduled); this kernel is the hand-scheduled alternative and
runs under ``interpret=True`` on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['corr_at_indices_pallas']


def _corr_kernel(
    starts_ref,  # scalar prefetch: (n_starts,) int32
    xr_hbm,
    xi_hbm,
    out_r,
    out_i,
    pa_out,
    pb_out,
    slab_ar,
    slab_ai,
    slab_br,
    slab_bi,
    sems,
    *,
    nfft: int,
    ncp: int,
    tile: int,
    n_starts: int,
    norm: bool,
):
    t = pl.program_id(0)
    l0 = t * tile
    span = tile + ncp - 1  # samples needed to produce `tile` window sums

    def load(dst, src, offset):
        dma = pltpu.make_async_copy(src.at[pl.ds(offset, span)], dst, sems)
        dma.start()
        dma.wait()

    def movsum(v):
        # running sum of width ncp: w[j] = sum(v[j:j+ncp]), j in [0, tile)
        cs = jnp.cumsum(v)
        hi = jax.lax.slice(cs, (ncp - 1,), (ncp - 1 + tile,))
        lo = jnp.concatenate(
            [jnp.zeros((1,), v.dtype), jax.lax.slice(cs, (0,), (tile - 1,))]
        )
        return hi - lo

    def body(i, acc):
        acc_r, acc_i, acc_pa, acc_pb = acc
        s = starts_ref[i]

        load(slab_ar, xr_hbm, s + l0)
        load(slab_ai, xi_hbm, s + l0)
        load(slab_br, xr_hbm, s + l0 + nfft)
        load(slab_bi, xi_hbm, s + l0 + nfft)

        ar, ai = slab_ar[:], slab_ai[:]
        br, bi = slab_br[:], slab_bi[:]

        # z = a * conj(b)
        zr = ar * br + ai * bi
        zi = ai * br - ar * bi

        acc_r = acc_r + movsum(zr)
        acc_i = acc_i + movsum(zi)
        if norm:
            acc_pa = acc_pa + movsum(ar * ar + ai * ai)
            acc_pb = acc_pb + movsum(br * br + bi * bi)
        return acc_r, acc_i, acc_pa, acc_pb

    zeros = jnp.zeros((tile,), jnp.float32)
    acc_r, acc_i, acc_pa, acc_pb = jax.lax.fori_loop(
        0, n_starts, body, (zeros, zeros, zeros, zeros)
    )

    out_r[:] = acc_r
    out_i[:] = acc_i
    pa_out[:] = acc_pa
    pb_out[:] = acc_pb


def corr_at_indices_pallas(starts, x, nfft: int, ncp: int, norm: bool = True, *, tile: int = 512, interpret: bool = False):
    """cyclic-prefix correlation via the Pallas kernel.

    Args:
        starts: (n_starts,) int array of cp start indices (each row of the
            reference's index tensor is start + arange(ncp))
        x: complex waveform (1-D)
        nfft, ncp: numerology sizes
        norm: normalize by the windowed power (reference _jit/cpu.py:34-40)
        tile: lags computed per grid step
        interpret: run in the Pallas interpreter (CPU tests)

    Returns:
        complex64 correlation sequence of length nfft + ncp
    """
    starts = np.asarray(starts, dtype=np.int32)
    n_starts = int(starts.shape[0])
    n_lags = nfft + ncp

    n_tiles = -(-n_lags // tile)
    span = tile + ncp - 1

    x = jnp.asarray(x)
    # zero-pad so every slab read is in bounds; out-of-range pairs then
    # contribute zero, matching the reference kernel's bounds check
    max_read = int(starts.max()) + (n_tiles * tile) + ncp - 1 + nfft
    pad = max(0, max_read + 1 - x.shape[0])
    xr = jnp.concatenate([jnp.real(x), jnp.zeros((pad,), jnp.float32)]).astype(
        jnp.float32
    )
    xi = jnp.concatenate([jnp.imag(x), jnp.zeros((pad,), jnp.float32)]).astype(
        jnp.float32
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tile,), lambda i, s: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i, s: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i, s: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i, s: (i,), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((span,), jnp.float32),
            pltpu.VMEM((span,), jnp.float32),
            pltpu.VMEM((span,), jnp.float32),
            pltpu.VMEM((span,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    out_shape = [
        jax.ShapeDtypeStruct((n_tiles * tile,), jnp.float32) for _ in range(4)
    ]

    out_r, out_i, pa, pb = pl.pallas_call(
        functools.partial(
            _corr_kernel,
            nfft=nfft,
            ncp=ncp,
            tile=tile,
            n_starts=n_starts,
            norm=norm,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(starts), xr, xi)

    corr = jax.lax.complex(out_r, out_i)[:n_lags]
    if norm:
        denom = jnp.sqrt(pa * pb)[:n_lags]
        corr = corr / denom.astype(corr.real.dtype)
    else:
        corr = corr / (n_starts * ncp)

    return corr.astype(jnp.complex64)
