"""FFT wrappers and the monotonic fftfreq replacement.

Feature parity: reference fourier.py:200-245 (fft/ifft backend dispatch),
fourier.py:248-269 (linspace-formulated fftfreq), fourier.py:168-197
(cupy chunked-FFT helper — superseded here by XLA's batched FFT; the
memory-bounding role of that chunking is provided instead by
parallel.streaming's lax.scan chunked pipelines).

TPU-native notes:

* jax inputs run jnp.fft through XLA's batched FFT. ``out=`` /
  ``overwrite_x=`` are accepted for reference API compatibility; under XLA,
  buffer reuse is the compiler's job (donation happens at jit boundaries),
  so they carry no semantics here. This matches the survey guidance to
  "match semantics (results), not mechanism" (SURVEY.md §7f).
* numpy inputs run threaded scipy.fft with workers=CPU_COUNT//2, matching
  reference fourier.py:214-218, so host-side parity oracles behave
  identically.
"""

from __future__ import annotations

from os import cpu_count

import jax.numpy as jnp
import numpy as np

from ..utils import array_namespace, lazy_import

scipy_fft = lazy_import('scipy.fft')

CPU_COUNT = cpu_count()

__all__ = ['fft', 'fftfreq', 'ifft', 'resolve_fft_backend']

# memory-bounding knob for the threaded host path (reference
# fourier.py:48,61-67,168-197). Device FFTs under XLA ignore it: jit
# buffer planning bounds workspace there, and streaming memory bounds
# come from parallel.streaming's scan chunking.
MAX_FFT_CHUNK_SAMPLES = None


def set_max_fft_chunk(count):
    """bound host (scipy) FFT workspace to ``count`` samples per call
    (reference set_max_cupy_fft_chunk, fourier.py:61-63). Batched numpy
    transforms larger than this run chunk-at-a-time into a preallocated
    output (see ``_chunked_host_transform``). No-op for device FFTs
    under XLA. ``None`` disables chunking."""
    global MAX_FFT_CHUNK_SAMPLES
    MAX_FFT_CHUNK_SAMPLES = count


def get_max_fft_chunk():
    """(reference fourier.py:66-67)"""
    return MAX_FFT_CHUNK_SAMPLES


def _chunked_host_transform(func, x, axis, workers):
    """run a scipy transform over <=MAX_FFT_CHUNK_SAMPLES batch chunks,
    sparing ``axis`` (the memory-bounding role of reference
    fourier.py:168-197's grouped cufft helper, on the host path).

    Only batched inputs can be split without changing the transform; a
    single 1-D transform larger than the knob runs whole.
    """
    from ..utils import grouped_views_along_axis

    max_size = MAX_FFT_CHUNK_SAMPLES
    if max_size is None or x.size <= max_size or x.ndim < 2:
        return None

    out = np.empty(x.shape, dtype=np.result_type(x.dtype, np.complex64))
    for x_view, out_view in zip(
        grouped_views_along_axis(x, max_size, axis=axis),
        grouped_views_along_axis(out, max_size, axis=axis),
    ):
        out_view[...] = func(x_view, axis=axis, workers=workers)
    return out


# 'auto' resolves to the MXU four-step transform only below this size:
# its cost is 2n(a+b) MACs vs the FFT's (5/2) n log2 n, so it wins for
# the batched mid-size transforms that dominate this framework (the MACs
# run at MXU rate, an order of magnitude over the VPU-bound XLA FFT at
# 1k-16k points — ops.mxu_fft docstring) but loses asymptotically: at
# n = 2^24 the matmul form is ~100x more FLOPs. 32768 keeps every bench
# shape (nfft <= 16384) on the MXU with ~1 MB DFT constants, and leaves
# whole-capture transforms (ops.filtering.resample) on the XLA FFT.
MXU_AUTO_MAX_SIZE = 32768


def _tpu_needs_bluestein(n: int, tpu: bool = None) -> bool:
    """True when jnp.fft at size ``n`` must route through the Bluestein
    transform (ops.czt): XLA:TPU lowers non-power-of-two FFTs as a dense
    n x n DFT matmul, which exceeds HBM at compile time for whole-capture
    sizes (f32[326376, 326376] = 426 GB in the round-5 clock-sync
    failure) and is O(n^2) even when it fits. Power-of-two sizes lower
    natively; CPU/GPU backends handle any size."""
    if n <= 1 or (n & (n - 1)) == 0:
        return False
    if tpu is None:
        from .pallas._common import on_tpu_like

        tpu = on_tpu_like()
    return tpu


def resolve_fft_backend(x, n: int, *, tpu: bool = None) -> str:
    """fft_backend='auto' resolution for the plain transforms: 'mxu'
    (four-step DFT matmuls at HIGHEST precision, matching jnp.fft to
    float32 roundoff) on TPU targets for jax input of composite static
    length <= MXU_AUTO_MAX_SIZE, else 'xla'. Same contract as
    ops.spectral._resolve_psd_backend: never raises — unsupported inputs
    quietly take the XLA path (VERDICT r4 #4)."""
    if tpu is None:
        from .pallas._common import on_tpu_like

        tpu = on_tpu_like()
    if not tpu or array_namespace(x) is not jnp:
        return 'xla'
    if not isinstance(n, int) or not 1 < n <= MXU_AUTO_MAX_SIZE:
        return 'xla'
    from .mxu_fft import plan_factors

    try:
        plan_factors(n)
    except ValueError:
        return 'xla'
    return 'mxu'


def fft(x, axis=-1, out=None, overwrite_x=False, plan=None, workers=None, backend='xla'):
    """forward FFT along ``axis`` (reference fourier.py:200-218).

    backend='mxu' uses the four-step DFT-matmul transform (ops.mxu_fft)
    on jax inputs of composite static length; 'auto' picks 'mxu' on TPU
    targets when the transform qualifies (resolve_fft_backend).
    """
    xp = array_namespace(x)
    if xp is jnp:
        if backend == 'auto':
            backend = resolve_fft_backend(x, int(x.shape[axis]))
        if backend == 'mxu':
            from .mxu_fft import fft_mxu

            return fft_mxu(x, axis=axis)
        if _tpu_needs_bluestein(int(x.shape[axis])):
            from .czt import fft_bluestein

            return fft_bluestein(x, axis=axis)
        return jnp.fft.fft(x, axis=axis)
    if workers is None:
        workers = max(CPU_COUNT // 2, 1)
    chunked = _chunked_host_transform(scipy_fft.fft, x, axis, workers)
    if chunked is not None:
        return chunked
    return scipy_fft.fft(x, axis=axis, workers=workers, overwrite_x=overwrite_x)


def ifft(x, axis=-1, out=None, overwrite_x=False, plan=None, workers=None, backend='xla'):
    """inverse FFT along ``axis`` (reference fourier.py:221-245)."""
    xp = array_namespace(x)
    if xp is jnp:
        if backend == 'auto':
            backend = resolve_fft_backend(x, int(x.shape[axis]))
        if backend == 'mxu':
            from .mxu_fft import ifft_mxu

            return ifft_mxu(x, axis=axis)
        if _tpu_needs_bluestein(int(x.shape[axis])):
            from .czt import ifft_bluestein

            return ifft_bluestein(x, axis=axis)
        return jnp.fft.ifft(x, axis=axis)
    if workers is None:
        workers = max(CPU_COUNT // 2, 1)
    chunked = _chunked_host_transform(scipy_fft.ifft, x, axis, workers)
    if chunked is not None:
        return chunked
    return scipy_fft.ifft(x, axis=axis, workers=workers, overwrite_x=overwrite_x)


def fftfreq(n: int, d: float, *, xp=np, dtype='float64'):
    """rounding-error-mitigated replacement for scipy.fft.fftfreq
    (reference fourier.py:248-269).

    No fftshift is needed for complex-valued data; the result is monotonic,
    beginning in the negative half-space:

    * even n: linspace(-f_nyq, f_nyq - 2 f_nyq/n, n)
    * odd n:  linspace(-f_nyq + f_nyq/n, f_nyq - f_nyq/n, n)

    Args:
        n: fft size
        d: sample spacing (inverse of sample rate)
        xp: array module of the result (numpy for host axes, jnp for device)
    """
    dtype = np.dtype(dtype)
    fnyq = 1 / (2 * dtype.type(d))
    # even n spans [-fnyq, fnyq); odd n is symmetric about 0 with no
    # exact-Nyquist endpoint on either side
    if n % 2 == 0:
        lo, hi = -fnyq, fnyq - 2 * fnyq / n
    else:
        half_step = fnyq / n
        lo, hi = half_step - fnyq, fnyq - half_step
    return xp.linspace(lo, hi, n, dtype=dtype)
