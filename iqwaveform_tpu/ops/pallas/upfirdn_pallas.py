"""Pallas TPU kernel: polyphase upfirdn as a phase-grouped Toeplitz matmul.

The TPU-native equivalent of the reference's CUDA polyphase kernel
(cuda.py:49-294, C14 in SURVEY.md §2). Where the CUDA kernel computes one
output sample per thread with a gather-MAC over h_per_phase taps, this
kernel reorganizes the same math so the only in-kernel ops are a lane
concatenation, static sublane slices, and MXU matmuls — the BlockSpec
pipelining style that the tunneled Mosaic service compiles (see
fused_ola_pallas.py; the round-1 variant used manual 3-D slab DMA with
dynamic offsets, which the service rejects).

Math. With L = lcm(up, down), one period maps Lin = L/up input samples to
Lout = L/down output samples:

    y[m*Lout + l] = sum_j W[l, j] * x[m*Lin + j - pad],

W the (Lout, K) block-Toeplitz period matrix (build_polyphase_matrix).
Splitting j = q*Lin + r and phase-decomposing the padded input as
x_ph[m, r] = x_pad[m*Lin + r] gives, per phase r,

    y[(tile*T + t)*Lout + l] = sum_r sum_q x_ph[tile*T + t + q, r]
                                          * W[l, q*Lin + r]

— for each phase a CORRELATION over the block index, i.e. one dense
(B, 2T) @ (2T, T*Lout) matmul against a host-built banded operator
G_r[c, t*Lout + l] = W[l, (c-t)*Lin + r]. The kernel fetches two adjacent
(Lin*B_blk, T) column blocks of the phase planes per grid step (the same
lo/hi overlap trick as fused_ola_strided), slices each phase's B_blk rows
statically, and accumulates the Lin matmuls into the (B_blk, T*Lout)
output block. The output lane order (t, l) is exactly the flat output
stream: no in-kernel transpose or lane-splitting reshape.

The production upfirdn path is the XLA dilated conv in ops.resample_poly;
this kernel is the hand-scheduled alternative selected with
``upfirdn(..., backend='pallas')``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ._common import on_tpu_like as _on_tpu_like, round_up as _round_up


from ...utils import lru_cache

__all__ = ['build_polyphase_matrix', 'upfirdn_pallas']

_LANES = 128
_B_BLK = 32  # batch rows per grid block (MXU M dim)
_G_VMEM_CAP = 48 * 2 * _LANES * _LANES * 4  # ~6.3 MB banded-operator cap


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


@lru_cache()
def _banded_operator(w_key: bytes, Lout: int, K: int, Lin: int, T: int):
    """host-side G plane: G[r*2T + c, t*Lout + l] = W[l, (c-t)*Lin + r]
    (zero outside the filter support), stacked over phases r."""
    W = np.frombuffer(w_key, dtype='float32').reshape(Lout, K)
    c = np.arange(2 * T)[:, None]
    t = (np.arange(T * Lout) // Lout)[None, :]
    l_arr = (np.arange(T * Lout) % Lout)[None, :]
    q = c - t
    planes = []
    for r in range(Lin):
        j = q * Lin + r
        valid = (q >= 0) & (j < K)
        planes.append(
            np.where(
                valid, W[l_arr, np.clip(j, 0, K - 1)], np.float32(0.0)
            ).astype('float32')
        )
    return np.concatenate(planes, axis=0)  # (Lin*2T, T*Lout)


def _upfirdn_block_kernel(lo, hi, g, out, *, Lin, B_blk, T, Lout):
    slab = jnp.concatenate([lo[...], hi[...]], axis=1)  # (Lin*B_blk, 2T)
    acc = None
    for r in range(Lin):
        s_r = slab[r * B_blk : (r + 1) * B_blk, :]
        g_r = g[r * 2 * T : (r + 1) * 2 * T, :]
        d = jax.lax.dot_general(
            s_r,
            g_r,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    out[...] = acc


def _upfirdn_pallas_real(
    x2d, W, Lin, Lout, pad, n_out, *, interpret=False
):
    """batched real-input upfirdn through the Pallas kernel.

    x2d: (B, N) float32; W: (Lout, K) float32 period matrix. Rows are
    segmented in time to fill the 32-row batch blocks, phase-decomposed
    on the host side, and fed to the kernel as adjacent lo/hi column
    blocks of the (segment-row, block-position) planes.
    """
    B, N = x2d.shape
    K = W.shape[1]
    qK = -(-K // Lin) - 1  # max q with any support
    T = _round_up(max(_LANES, qK), _LANES)

    g_bytes = Lin * 2 * T * T * Lout * 4
    if g_bytes > _G_VMEM_CAP:
        raise ValueError(
            f'up/down ratio needs a {g_bytes / 1e6:.1f} MB banded operator '
            f'(Lin={Lin}, Lout={Lout}, T={T}); use the XLA backend'
        )

    nb = -(-n_out // Lout)  # output period blocks

    # segment rows in time so small batches still fill the 32-row MXU
    # block: s segments per row, each covering cb output blocks
    s = max(1, min(_B_BLK // max(B, 1), nb))
    cb = -(-nb // s)
    nt = -(-cb // T)  # grid steps along time
    M_total = (nt + 1) * T  # block-positions per segment (lo + hi halo)

    # pad: `pad` zeros on the left (filter group delay), zeros right to
    # cover the last segment's halo reads
    need = (s - 1) * cb * Lin + M_total * Lin
    x_pad = jnp.pad(x2d, ((0, 0), (pad, max(0, need - pad - N))))
    if s > 1:
        x_seg = jnp.stack(
            [
                x_pad[:, seg * cb * Lin : seg * cb * Lin + M_total * Lin]
                for seg in range(s)
            ],
            axis=1,
        ).reshape(B * s, M_total * Lin)
    else:
        x_seg = x_pad[:, : M_total * Lin]

    B_eff = B * s
    B_p = _round_up(B_eff, _B_BLK)
    if B_p != B_eff:
        x_seg = jnp.pad(x_seg, ((0, B_p - B_eff), (0, 0)))

    # phase planes, grouped (batch-block, phase, row-in-block):
    # row g*Lin*B_blk + r*B_blk + b_in = phase r of batch row g*B_blk+b_in
    x_ph = (
        x_seg.reshape(B_p // _B_BLK, _B_BLK, M_total, Lin)
        .transpose(0, 3, 1, 2)
        .reshape(B_p // _B_BLK * Lin * _B_BLK, M_total)
    )

    G = _banded_operator(
        np.ascontiguousarray(W.astype('float32')).tobytes(), Lout, K, Lin, T
    )

    row_blk = Lin * _B_BLK
    lo_spec = pl.BlockSpec((row_blk, T), lambda b, t: (b, t))
    hi_spec = pl.BlockSpec((row_blk, T), lambda b, t: (b, t + 1))
    g_spec = pl.BlockSpec(G.shape, lambda b, t: (0, 0))
    out_spec = pl.BlockSpec((_B_BLK, T * Lout), lambda b, t: (b, t))

    out = pl.pallas_call(
        functools.partial(
            _upfirdn_block_kernel, Lin=Lin, B_blk=_B_BLK, T=T, Lout=Lout
        ),
        grid=(B_p // _B_BLK, nt),
        in_specs=[lo_spec, hi_spec, g_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B_p, nt * T * Lout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary'),
        ),
        interpret=interpret,
    )(x_ph, x_ph, jnp.asarray(G))

    # reassemble segments: row-major (B, s) rows, each segment's first
    # cb*Lout samples are its valid span
    y = out[:B_eff].reshape(B, s, nt * T * Lout)[:, :, : cb * Lout]
    return y.reshape(B, s * cb * Lout)[:, :n_out]


def upfirdn_pallas(h, x, up: int = 1, down: int = 1, *, interpret=None):
    """polyphase upfirdn via the Pallas Toeplitz-matmul kernel.

    Semantics match scipy.signal.upfirdn along the last axis. Real or
    complex x; real or complex h (complex inputs ride as extra batch
    rows; a complex filter runs the kernel once per W component).

    Args:
        interpret: run in the Pallas interpreter (None = auto: interpret
            everywhere except a real TPU target)
    """
    if interpret is None:
        interpret = not _on_tpu_like()
    h = np.asarray(h)
    x = jnp.asarray(x)
    if h.ndim != 1 or h.size == 0:
        raise ValueError('h must be 1D with non-zero length')

    squeeze = x.ndim == 1
    x2d = x[None, :] if squeeze else x.reshape((-1, x.shape[-1]))
    N = x2d.shape[-1]
    n_out = (((N - 1) * up + len(h)) - 1) // down + 1

    run = functools.partial(_upfirdn_pallas_real, interpret=interpret)

    if np.iscomplexobj(h):
        Wr, Lin, Lout, pad = build_polyphase_matrix(
            h.real.astype('float32'), up, down
        )
        Wi, _, _, _ = build_polyphase_matrix(h.imag.astype('float32'), up, down)
    else:
        Wr, Lin, Lout, pad = build_polyphase_matrix(h.astype('float32'), up, down)
        Wi = None

    if jnp.iscomplexobj(x2d):
        B = x2d.shape[0]
        # real/imag planes ride as one doubled batch through each kernel run
        planes = jnp.concatenate(
            [jnp.real(x2d), jnp.imag(x2d)], axis=0
        ).astype('float32')
        yr = run(planes, Wr, Lin, Lout, pad, n_out)
        if Wi is None:
            y = jax.lax.complex(yr[:B], yr[B:])
        else:
            yi = run(planes, Wi, Lin, Lout, pad, n_out)
            y = jax.lax.complex(yr[:B] - yi[B:], yr[B:] + yi[:B])
    else:
        y = run(x2d.astype('float32'), Wr, Lin, Lout, pad, n_out)
        if Wi is not None:
            y = jax.lax.complex(
                y, run(x2d.astype('float32'), Wi, Lin, Lout, pad, n_out)
            )

    if squeeze:
        return y[0]
    return y.reshape(x.shape[:-1] + (n_out,))
