"""Pallas TPU kernel: cyclic-prefix correlation at index sets.

The TPU-native equivalent of the reference's numba CPU / numba-CUDA
gather-MAC kernels (_jit/cpu.py:6-42, _jit/cuda.py:7-43 — C16 in
SURVEY.md §2). The CUDA kernel assigns one output lag per thread and
iterates all cp sample indices; this kernel exploits two linearities
instead:

    out[j] = sum_s movsum(z, ncp)[start_s + j],  z[t] = x[t] conj(x[t+nfft])
           = movsum( sum_s z[start_s + l0 : start_s + l0 + span] )[j]

so per lag tile it (1) DMAs and *accumulates* the per-start slabs — four
float32 rows: Re z, Im z, |a|^2, |b|^2 — and then (2) applies the
ncp-wide running sum to the accumulated slab as ONE (8, span) @
(span, tile) matmul against a banded ones matrix on the MXU. No cumsum,
no gathers, no per-start window work.

The production path is the pure-XLA formulation in models.ofdm (identical
math); this kernel is the hand-scheduled alternative and runs under
``interpret=True`` on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['corr_at_indices_pallas']


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _corr_kernel(
    starts_ref,  # scalar prefetch: (n_starts,) int32
    xr_hbm,
    xi_hbm,
    band_ref,  # (span_p, tile) f32 banded ones (VMEM)
    out_ref,  # (8, tile) f32: rows 0..3 = corr_r, corr_i, pa, pb
    slab_ref,  # (8, span_p) f32: rows 0,1 = a planes; rows 2,3 = b planes
    acc_ref,  # (8, span_p) f32 accumulator
    sems,
    *,
    nfft: int,
    span_p: int,
    tile: int,
    n_starts: int,
):
    t = pl.program_id(0)
    l0 = t * tile

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(i, _):
        s = starts_ref[i]

        for row, src, off in (
            (0, xr_hbm, 0),
            (1, xi_hbm, 0),
            (2, xr_hbm, nfft),
            (3, xi_hbm, nfft),
        ):
            dma = pltpu.make_async_copy(
                src.at[pl.ds(s + l0 + off, span_p)],
                slab_ref.at[row, :],
                sems,
            )
            dma.start()
            dma.wait()

        ar, ai = slab_ref[0, :], slab_ref[1, :]
        br, bi = slab_ref[2, :], slab_ref[3, :]

        # z = a * conj(b); accumulate the four reduction rows (full
        # aligned width; band rows beyond span are zero so the extra
        # samples cannot reach the output)
        acc_ref[0, :] += ar * br + ai * bi  # Re z
        acc_ref[1, :] += ai * br - ar * bi  # Im z
        acc_ref[2, :] += ar * ar + ai * ai  # |a|^2
        acc_ref[3, :] += br * br + bi * bi  # |b|^2
        return 0

    jax.lax.fori_loop(0, n_starts, body, 0)

    # the ncp-wide running sum of all four rows at once: one MXU matmul
    out_ref[:] = jnp.dot(
        acc_ref[:], band_ref[:], preferred_element_type=jnp.float32
    )


def corr_at_indices_pallas(
    starts,
    x,
    nfft: int,
    ncp: int,
    norm: bool = True,
    *,
    tile: int = 512,
    interpret: bool = False,
):
    """cyclic-prefix correlation via the Pallas kernel.

    Args:
        starts: (n_starts,) int array of cp start indices (each row of the
            reference's index tensor is start + arange(ncp))
        x: complex waveform (1-D)
        nfft, ncp: numerology sizes
        norm: normalize by the windowed power (reference _jit/cpu.py:34-40)
        tile: lags computed per grid step (multiple of 128)
        interpret: run in the Pallas interpreter (CPU tests)

    Returns:
        complex64 correlation sequence of length nfft + ncp
    """
    starts = np.asarray(starts, dtype=np.int32)
    n_starts = int(starts.shape[0])
    n_lags = nfft + ncp

    tile = _round_up(tile, 128)
    n_tiles = -(-n_lags // tile)
    span = tile + ncp - 1
    span_p = _round_up(span, 128)

    x = jnp.asarray(x)
    # zero-pad so every slab read is in bounds; out-of-range pairs then
    # contribute zero, matching the reference kernel's bounds check
    max_read = int(starts.max()) + (n_tiles * tile) + ncp - 1 + nfft + span_p
    pad = max(0, max_read + 1 - x.shape[0])
    xr = jnp.concatenate([jnp.real(x), jnp.zeros((pad,), jnp.float32)]).astype(
        jnp.float32
    )
    xi = jnp.concatenate([jnp.imag(x), jnp.zeros((pad,), jnp.float32)]).astype(
        jnp.float32
    )

    # banded running-sum matrix: band[s, j] = 1 iff 0 <= s - j < ncp
    srange = np.arange(span_p)[:, None]
    jrange = np.arange(tile)[None, :]
    band = (((srange - jrange) >= 0) & ((srange - jrange) < ncp)).astype('float32')

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (span_p, tile), lambda i, s: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, tile), lambda i, s: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((8, span_p), jnp.float32),
            pltpu.VMEM((8, span_p), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _corr_kernel,
            nfft=nfft,
            span_p=span_p,
            tile=tile,
            n_starts=n_starts,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, n_tiles * tile), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(starts), xr, xi, jnp.asarray(band))

    corr = jax.lax.complex(out[0], out[1])[:n_lags]
    if norm:
        denom = jnp.sqrt(out[2] * out[3])[:n_lags]
        corr = corr / denom.astype(corr.real.dtype)
    else:
        corr = corr / (n_starts * ncp)

    return corr.astype(jnp.complex64)
