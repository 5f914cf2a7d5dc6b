"""Pallas TPU kernel: cyclic-prefix correlation at index sets.

The TPU-native equivalent of the reference's numba CPU / numba-CUDA
gather-MAC kernels (_jit/cpu.py:6-42, _jit/cuda.py:7-43 — C16 in
SURVEY.md §2). The CUDA kernel assigns one output lag per thread and
iterates all cp sample indices; this design exploits two linearities
instead:

    out[j] = sum_s sum_{c<ncp} z[start_s + c + j],   z[t] = x[t] conj(x[t+nfft])
           = movsum_ncp( acc )[j],                   acc[l] = sum_s z[start_s + l]

and splits the work by what each engine is good at:

* XLA side: the lag product z (one fused elementwise pass) and the
  start-set accumulation ``acc`` — the starts are static numerology
  constants at trace time, so for small sets the sum unrolls into static
  slices and for large sets it runs as a lax.scan of dynamic slices.
  Four float32 rows: Re z, Im z, |a|^2, |b|^2.
* Pallas kernel: the ncp-wide running sum of all four rows as ONE
  (8, W) @ (W, tile) MXU matmul against a banded 0/1 operator, with the
  normalization (corr / sqrt(power_a * power_b)) fused into the same
  kernel pass. Inputs arrive as adjacent BlockSpec column blocks of the
  accumulated planes (the lo/hi overlap pattern of fused_ola_pallas —
  no manual DMA, no fori_loop, no dynamic offsets, which the tunneled
  Mosaic service rejects; this replaces the round-1 DMA-loop variant).

The production path is the pure-XLA formulation in models.ofdm (identical
math); this kernel is the hand-scheduled alternative selected with
``corr_at_indices(..., backend='pallas')``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ._common import on_tpu_like as _on_tpu_like, round_up as _round_up


__all__ = ['corr_at_indices_pallas']

_UNROLL_MAX = 64  # static-slice accumulation cap; larger sets use scan


def _movsum_norm_kernel(*refs, norm, scale, nblk, tile):
    """refs = (win_0..win_nblk, band, out): windowed banded matmul of the
    four accumulated rows + fused normalization."""
    wins = refs[: nblk + 1]
    band = refs[nblk + 1]
    out = refs[nblk + 2]

    win = jnp.concatenate([w[...] for w in wins], axis=1)  # (8, (nblk+1)*tile)
    mv = jax.lax.dot_general(
        win,
        band[...],
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (8, tile): rows 0..3 = movsum of Re z, Im z, |a|^2, |b|^2

    if norm:
        inv = jax.lax.rsqrt(mv[2:3, :] * mv[3:4, :])
        out[...] = jnp.concatenate(
            [mv[0:2, :] * inv, mv[2:, :]], axis=0
        )
    else:
        out[...] = jnp.concatenate(
            [mv[0:2, :] * np.float32(1.0 / scale), mv[2:, :]], axis=0
        )


def _accumulate_starts(z4, starts, span: int):
    """acc[k, l] = sum_s z4[k, s + l] for l in [0, span) — starts are
    static trace-time constants (numerology design)."""
    n_starts = starts.shape[0]
    if n_starts <= _UNROLL_MAX:
        acc = z4[:, starts[0] : starts[0] + span]
        for s in starts[1:]:
            acc = acc + z4[:, int(s) : int(s) + span]
        return acc

    def body(carry, s):
        return (
            carry + jax.lax.dynamic_slice(z4, (0, s), (4, span)),
            None,
        )

    init = jnp.zeros((4, span), jnp.float32)
    acc, _ = jax.lax.scan(body, init, jnp.asarray(starts, jnp.int32))
    return acc


def corr_at_indices_pallas(
    starts,
    x,
    nfft: int,
    ncp: int,
    norm: bool = True,
    *,
    tile: int = 512,
    interpret: bool = None,
):
    """cyclic-prefix correlation via the fused movsum/normalize kernel.

    Args:
        starts: (n_starts,) int array of cp start indices (each row of the
            reference's index tensor is start + arange(ncp)); static
            host values (numerology design constants)
        x: complex waveform (1-D)
        nfft, ncp: numerology sizes
        norm: normalize by the windowed power (reference _jit/cpu.py:34-40)
        tile: lags computed per grid step (multiple of 128)
        interpret: run in the Pallas interpreter (None = auto: interpret
            everywhere except a real TPU target)

    Returns:
        complex64 correlation sequence of length nfft + ncp
    """
    if interpret is None:
        interpret = not _on_tpu_like()
    starts = np.asarray(starts, dtype=np.int64)
    n_starts = int(starts.shape[0])
    n_lags = nfft + ncp

    tile = _round_up(tile, 128)
    n_tiles = -(-n_lags // tile)
    nblk = -(-max(ncp - 1, 1) // tile)  # extra halo blocks for the movsum
    span = n_lags + ncp - 1  # acc extent actually used
    lanes = (n_tiles + nblk + 1) * tile  # kernel fetch extent

    x = jnp.asarray(x)
    N = x.shape[0]

    # lag product planes; zero-pad so out-of-range pairs contribute zero,
    # matching the reference kernel's bounds check (_jit/cpu.py:21-26)
    a = x[: max(N - nfft, 0)]
    b = x[nfft:]
    ar, ai = jnp.real(a).astype(jnp.float32), jnp.imag(a).astype(jnp.float32)
    br, bi = jnp.real(b).astype(jnp.float32), jnp.imag(b).astype(jnp.float32)
    z4 = jnp.stack(
        [
            ar * br + ai * bi,  # Re z
            ai * br - ar * bi,  # Im z
            ar * ar + ai * ai,  # |a|^2
            br * br + bi * bi,  # |b|^2
        ]
    )
    max_read = int(starts.max()) + span
    pad = max(0, max_read - z4.shape[1])
    if pad:
        z4 = jnp.concatenate([z4, jnp.zeros((4, pad), jnp.float32)], axis=1)

    acc = _accumulate_starts(z4, starts, span)
    acc = jnp.concatenate(
        [acc, jnp.zeros((4, lanes - span), jnp.float32)], axis=1
    )
    acc = jnp.concatenate([acc, jnp.zeros((4, lanes), jnp.float32)], axis=0)

    # banded running-sum operator: band[c, j] = 1 iff 0 <= c - j < ncp
    c_idx = np.arange((nblk + 1) * tile)[:, None]
    j_idx = np.arange(tile)[None, :]
    band = (((c_idx - j_idx) >= 0) & ((c_idx - j_idx) < ncp)).astype('float32')

    win_specs = [
        pl.BlockSpec((8, tile), functools.partial(lambda t, k: (0, t + k), k=k))
        for k in range(nblk + 1)
    ]
    band_spec = pl.BlockSpec(band.shape, lambda t: (0, 0))
    out_spec = pl.BlockSpec((8, tile), lambda t: (0, t))

    out = pl.pallas_call(
        functools.partial(
            _movsum_norm_kernel,
            norm=bool(norm),
            scale=float(n_starts * ncp),
            nblk=nblk,
            tile=tile,
        ),
        grid=(n_tiles,),
        in_specs=win_specs + [band_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((8, n_tiles * tile), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
        ),
        interpret=interpret,
    )(*([acc] * (nblk + 1)), jnp.asarray(band))

    return jax.lax.complex(out[0], out[1])[:n_lags].astype(jnp.complex64)
