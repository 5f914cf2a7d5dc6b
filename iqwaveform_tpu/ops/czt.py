"""Bluestein (chirp-Z) arbitrary-size FFT for TPU targets.

XLA:TPU lowers a non-power-of-two FFT as a dense n x n DFT matmul; at
whole-capture sizes the DFT matrix exceeds HBM *at compile time* (the
round-5 finding: the clock synchronizer's per-pass device resample at
n=326376 = 2^3*3^3*1511 tried to allocate f32[n, n] = 426 GB and the
remote AOT compile died). Bluestein's identity

    X[k] = a[k] * sum_j (x[j] a[j]) * b[k - j],   a[k] = e^{-i pi k^2 / n},
    b[m] = e^{+i pi m^2 / n}

turns any-size DFT into one size-M circular convolution (M = next power
of two >= 2n-1), i.e. two size-M power-of-two FFTs plus O(n) chirp
multiplies — the TPU-native formulation of an arbitrary-size transform
(pow2 FFTs lower natively on TPU; everything else here is elementwise).

Chirp phases use k^2 mod 2n in exact integer arithmetic on the host
(k^2 overflows float32 exactness at k ~ 4096 and float64 at k ~ 9.4e7),
following the design-dict pattern (SURVEY.md §5): the chirp and the
pre-transformed kernel spectrum are host numpy constants that embed in
the jit trace — never device-resident cached arrays (lowering those
needs D2H, which the tunneled attachment forbids).

Reference counterpart: none (the reference's scipy/cupy FFTs handle
arbitrary sizes natively; this is TPU-enabling infrastructure consumed
by ops.fft.fft/ifft routing).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import lru_cache

__all__ = ['fft_bluestein', 'ifft_bluestein']


@lru_cache()
def _bluestein_design(n: int):
    """host-side chirp design for an n-point transform.

    Returns (a, b_hat, M): the length-n forward chirp, the length-M FFT
    of the wrapped chirp kernel, and the pow2 convolution size. All
    host numpy (complex64), exact-phase via integer k^2 mod 2n.
    """
    if n < 1:
        raise ValueError(f'transform size must be positive, not {n}')
    v = 2 * n - 1
    M = 1 << (v - 1).bit_length() if v > 1 else 1
    k = np.arange(n, dtype=np.int64)
    # e^{-i pi k^2 / n} with k^2 reduced mod 2n BEFORE the float cast:
    # the phase is periodic in k^2 with period 2n, and the reduced
    # integer is exact in float64
    phase = ((k * k) % (2 * n)).astype(np.float64) * (np.pi / n)
    a = np.exp(-1j * phase)
    # kernel b[m] = conj(a)[|m|] for |m| <= n-1, zero-padded to M and
    # wrapped circularly (negative lags at the top end)
    b = np.zeros(M, dtype=np.complex128)
    b[:n] = np.conj(a)
    if n > 1:
        b[M - (n - 1) :] = np.conj(a[1:])[::-1]
    b_hat = np.fft.fft(b)
    return (
        a.astype(np.complex64),
        b_hat.astype(np.complex64),
        M,
    )


def _reshape_for(vec: np.ndarray, ndim: int, axis: int):
    shape = [1] * ndim
    shape[axis] = vec.shape[0]
    return vec.reshape(shape)


def fft_bluestein(x, axis: int = -1):
    """forward DFT of arbitrary static size via Bluestein's algorithm.

    Matches jnp.fft.fft(x, axis=axis) to float32 roundoff while lowering
    only pow2 FFTs + elementwise chirp multiplies (TPU-supported at any
    size). Traceable; sizes are static per trace.
    """
    axis = axis % x.ndim
    n = int(x.shape[axis])
    a, b_hat, M = _bluestein_design(n)
    if n == 1:
        return x.astype(jnp.complex64)
    a_j = _reshape_for(a, x.ndim, axis)
    bh_j = _reshape_for(b_hat, x.ndim, axis)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, M - n)
    xa = jnp.pad(x * a_j, pad)
    y = jnp.fft.ifft(jnp.fft.fft(xa, axis=axis) * bh_j, axis=axis)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, n)
    return y[tuple(sl)] * a_j


def ifft_bluestein(x, axis: int = -1):
    """inverse DFT of arbitrary static size via Bluestein's algorithm
    (conjugation identity: ifft(x) = conj(fft(conj(x))) / n)."""
    axis = axis % x.ndim
    n = int(x.shape[axis])
    return jnp.conj(fft_bluestein(jnp.conj(x), axis=axis)) / n
