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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _upfirdn_block_kernel(
    x_hbm, w_ref, out_ref, slab, sem, *, Lin, K_p, T, W_ph, Lout, Lout_p
):
    b = pl.program_id(0)
    t = pl.program_id(1)

    # phase-decomposed slab for 8 batch rows: x_hbm[b', r, m] = x[m*Lin+r];
    # the tile needs phase columns [t*T, t*T + W_ph)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(b * 8, 8), :, pl.ds(t * T, W_ph)],
        slab,
        sem,
    )
    dma.start()
    dma.wait()

    # window matrix X[r', j, t'] = x[(t*T + t')*Lin + j]
    #             = slab[r', j % Lin, j // Lin + t']  — contiguous slices
    rows = [
        slab[:, j % Lin, (j // Lin) : (j // Lin) + T] for j in range(K_p)
    ]
    X = jnp.stack(rows, axis=1)  # (8, K_p, T)

    # the polyphase MAC as one batched MXU matmul
    Y = jnp.einsum(
        'lk,bkt->blt', w_ref[:], X, preferred_element_type=jnp.float32
    )  # (8, Lout_p, T)

    out_ref[:] = jnp.swapaxes(Y[:, :Lout, :], 1, 2).reshape(8, T * Lout)


def _upfirdn_pallas_real(x2d, W, Lin, Lout, pad, n_out, *, block_T=None, interpret=False):
    """batched real-input upfirdn through the Pallas kernel.

    x2d: (B, N) float32; W: (Lout, K) float32. Shapes are padded to TPU
    tiling (8 batch rows per block, weights padded to (8m, 128m), output
    tiles a multiple of 128), and the input is phase-decomposed on the
    host so every in-kernel window slice is contiguous.
    """
    B, N = x2d.shape
    K = W.shape[1]
    K_p = _round_up(K, 128)
    Lout_p = _round_up(Lout, 8)

    nb = -(-n_out // Lout)  # output blocks
    if block_T is None:
        # smallest tile with T*Lout % 128 == 0, near 512 outputs wide
        base = max(1, 512 // max(Lout, 1))
        quantum = 128 // math.gcd(128, Lout)
        block_T = _round_up(base, quantum)
    nt = -(-nb // block_T)
    nb_padded = nt * block_T

    B_p = _round_up(B, 8)

    q_max = (K_p - 1) // Lin
    W_ph = block_T + q_max  # phase columns per tile

    # phase-decompose: x_ph[b, r, m] = x_pad[b, m*Lin + r]
    M = nt * block_T + q_max + 1
    x_pad = jnp.pad(x2d, ((0, B_p - B), (pad, max(0, M * Lin - pad - N))))
    x_ph = jnp.swapaxes(x_pad[:, : M * Lin].reshape(B_p, M, Lin), 1, 2)

    W_pad = np.zeros((Lout_p, K_p), dtype='float32')
    W_pad[:Lout, :K] = W

    out = pl.pallas_call(
        functools.partial(
            _upfirdn_block_kernel,
            Lin=Lin,
            K_p=K_p,
            T=block_T,
            W_ph=W_ph,
            Lout=Lout,
            Lout_p=Lout_p,
        ),
        grid=(B_p // 8, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec(
                (Lout_p, K_p), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, block_T * Lout), lambda b, t: (b, t), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B_p, nb_padded * Lout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, Lin, W_ph), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_ph, jnp.asarray(W_pad))

    return out[:B, :n_out]


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
