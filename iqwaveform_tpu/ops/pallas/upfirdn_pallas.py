"""Pallas TPU kernel: polyphase upfirdn as a block-Toeplitz matmul.

The TPU-native equivalent of the reference's CUDA polyphase kernel
(cuda.py:49-294, C14 in SURVEY.md §2). Where the CUDA kernel computes one
output sample per thread with a gather-MAC over h_per_phase taps, this
kernel reorganizes the same math to feed the MXU:

With L = lcm(up, down), Lin = L/up input samples produce Lout = L/down
output samples, and

    y[b*Lout + r] = sum_j W[r, j] * x[b*Lin + j - pad]

where W[r, j] = h[r*down - (j - pad)*up] (zero outside [0, len_h)) and
pad = floor((len_h - 1)/up). The kernel DMAs an overlapping input slab
from HBM into VMEM, forms the (K, T) window matrix with Lin-strided
slices, and computes the (Lout, K) @ (K, T) product on the MXU — a dense
polyphase filter bank instead of per-sample gathers.

The production upfirdn path is the XLA dilated conv in ops.resample_poly;
this kernel is the hand-scheduled alternative (select with
``upfirdn(..., backend='pallas')`` on real TPU hardware) and the pattern
template for future fused kernels.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['build_polyphase_matrix', 'upfirdn_pallas']


def build_polyphase_matrix(h: np.ndarray, up: int, down: int):
    """host-side design: the dense block-Toeplitz period matrix W.

    Returns:
        (W, Lin, Lout, pad): W has shape (Lout, K) with K = Lin + pad.
    """
    h = np.asarray(h)
    len_h = h.shape[0]
    L = math.lcm(up, down)
    Lin = L // up
    Lout = L // down
    pad = (len_h - 1) // up
    K = Lin + pad

    W = np.zeros((Lout, K), dtype=h.dtype)
    for r in range(Lout):
        for jp in range(K):
            tap = r * down - (jp - pad) * up
            if 0 <= tap < len_h:
                W[r, jp] = h[tap]
    return W, Lin, Lout, pad


def _upfirdn_block_kernel(x_hbm, w_ref, out_ref, slab, sem, *, Lin, K, T, Lout):
    b = pl.program_id(0)
    t = pl.program_id(1)

    # overlapping input slab: T*Lin samples + (K - Lin) halo
    start = t * (T * Lin)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(start, T * Lin + K - Lin)],
        slab,
        sem,
    )
    dma.start()
    dma.wait()

    vals = slab[:]

    # window matrix X[j, t'] = slab[t'*Lin + j]: K static strided slices
    rows = [
        jax.lax.slice(vals, (j,), (j + (T - 1) * Lin + 1,), (Lin,))
        for j in range(K)
    ]
    X = jnp.stack(rows, axis=0)  # (K, T)

    # the polyphase MAC as one MXU matmul
    Y = jnp.dot(w_ref[:], X, preferred_element_type=jnp.float32)  # (Lout, T)

    out_ref[:] = Y.T.reshape(1, T * Lout)


def _upfirdn_pallas_real(x2d, W, Lin, Lout, pad, n_out, *, block_T=None, interpret=False):
    """batched real-input upfirdn through the Pallas kernel.

    x2d: (B, N) float32; W: (Lout, K) float32.
    """
    B, N = x2d.shape
    K = W.shape[1]

    nb = -(-n_out // Lout)  # output blocks
    if block_T is None:
        # target roughly 512-wide output tiles
        block_T = max(1, min(nb, 512 // max(Lout, 1) + 1))
    nt = -(-nb // block_T)
    nb_padded = nt * block_T

    # pad so every block's slab read is in bounds:
    # slab for tile t spans [t*T*Lin, t*T*Lin + T*Lin + K - Lin)
    need = nb_padded * Lin + (K - Lin)
    x_pad = jnp.pad(x2d, ((0, 0), (pad, need - pad - N)))

    out = pl.pallas_call(
        functools.partial(
            _upfirdn_block_kernel, Lin=Lin, K=K, T=block_T, Lout=Lout
        ),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec(
                W.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_T * Lout), lambda b, t: (b, t), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, nb_padded * Lout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_T * Lin + K - Lin,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_pad, jnp.asarray(W, dtype='float32'))

    return out[:, :n_out]


def upfirdn_pallas(h, x, up: int = 1, down: int = 1, *, interpret=False):
    """polyphase upfirdn via the Pallas block-Toeplitz kernel.

    Semantics match scipy.signal.upfirdn along the last axis. Real or
    complex x; real or complex h (complex runs the real kernel per
    real/imag product term).

    Args:
        interpret: run in the Pallas interpreter (for CPU tests)
    """
    h = np.asarray(h)
    x = jnp.asarray(x)
    if h.ndim != 1 or h.size == 0:
        raise ValueError('h must be 1D with non-zero length')

    squeeze = x.ndim == 1
    x2d = x[None, :] if squeeze else x.reshape((-1, x.shape[-1]))
    N = x2d.shape[-1]
    n_out = (((N - 1) * up + len(h)) - 1) // down + 1

    run = functools.partial(interpret_run, interpret=interpret)

    if np.iscomplexobj(h):
        Wr, Lin, Lout, pad = build_polyphase_matrix(h.real.astype('float32'), up, down)
        Wi, _, _, _ = build_polyphase_matrix(h.imag.astype('float32'), up, down)
    else:
        Wr, Lin, Lout, pad = build_polyphase_matrix(h.astype('float32'), up, down)
        Wi = None

    if jnp.iscomplexobj(x2d):
        xr, xi = jnp.real(x2d).astype('float32'), jnp.imag(x2d).astype('float32')
        rr = run(xr, Wr, Lin, Lout, pad, n_out)
        ii = run(xi, Wr, Lin, Lout, pad, n_out)
        if Wi is None:
            y = jax.lax.complex(rr, ii)
        else:
            ri = run(xr, Wi, Lin, Lout, pad, n_out)
            ir = run(xi, Wi, Lin, Lout, pad, n_out)
            y = jax.lax.complex(rr - ir, ri + ii)
    else:
        y = run(x2d.astype('float32'), Wr, Lin, Lout, pad, n_out)
        if Wi is not None:
            y = jax.lax.complex(
                y, run(x2d.astype('float32'), Wi, Lin, Lout, pad, n_out)
            )

    if squeeze:
        return y[0]
    return y.reshape(x.shape[:-1] + (n_out,))


def interpret_run(x2d, W, Lin, Lout, pad, n_out, *, interpret):
    return _upfirdn_pallas_real(
        x2d, W, Lin, Lout, pad, n_out, interpret=interpret
    )
