"""STFT / ISTFT / spectrogram on batched XLA FFTs.

Feature parity: reference fourier.py:927-1057 (stft), fourier.py:1060-1104
(istft), fourier.py:545-581 (_stack_stft_windows), fourier.py:584-649
(_unstack_stft_windows grouped overlap-add), fourier.py:348-357
(_get_stft_axes), fourier.py:335-345 (broadcast_onto), fourier.py:1203-1233
(spectrogram).

TPU-native design (not a translation):

* Overlapping frames are built with a *block-row gather*: the waveform is
  reshaped into contiguous hop-sized blocks and frames are gathered as R =
  nperseg/hop consecutive block rows. The gather index set is (n_frames, R)
  — tiny — instead of an (n_frames, nperseg) element gather, and XLA fuses
  it with the window multiply feeding the batched FFT. This replaces the
  reference's zero-copy strided view (util.py:271-362), which has no XLA
  equivalent.
* The window carries a baked-in fftshift (see ops.window_design), so the
  full STFT is one fused gather->multiply->FFT program with no fftshift
  pass, same trick as reference fourier.py:139-146,1043.
* ISTFT overlap-add uses the reference's grouped-pass formulation
  (fourier.py:630-647) — already XLA-friendly: R static pad+add passes, no
  scatter. Group counts are 1,2,3,5 for the COLA windows in use.
* ``out=`` / ``overwrite_x=`` are accepted for API compatibility; XLA owns
  buffer reuse (donation happens at jit boundaries).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import array_namespace, lru_cache, to_blocks
from . import power as power_analysis
from .fft import fft, fftfreq, ifft
from .window_design import get_window

__all__ = ['broadcast_onto', 'istft', 'spectrogram', 'stft']


def broadcast_onto(a, other, *, axis: int):
    """reshape a 1-D array to broadcast onto ``axis`` of ``other``
    (reference fourier.py:335-345)."""
    if a.ndim != 1:
        raise ValueError('input array a must be 1-D')

    slices = [None] * other.ndim
    slices[axis] = slice(None, None)
    return a[tuple(slices)]


@lru_cache(16)
def _get_stft_axes(fs: float, nfft: int, time_size: int, overlap_frac: float = 0.0, *, xp=np):
    """(freqs, times) axis arrays (reference fourier.py:348-357)."""
    freqs = fftfreq(nfft, 1 / fs, xp=xp)
    times = xp.arange(time_size) * ((1 - overlap_frac) * nfft / fs)
    return freqs, times


def _axis_tuple(ndim: int, axis: int, sl):
    out = [slice(None)] * ndim
    out[axis] = sl
    return tuple(out)


def stft_frame_count(input_size: int, nperseg: int, noverlap: int) -> int:
    """number of STFT frames the reference framing produces
    (fourier.py:545-581: frames at offsets 0, hop, ... <= N - nperseg)."""
    hop = nperseg - noverlap
    return (input_size - nperseg) // hop + 1


def _gather_frames(x, nperseg: int, noverlap: int, axis: int):
    """build overlapping frames (..., F, nperseg, ...) along ``axis``.

    Fast path (hop divides nperseg, true for every COLA configuration):
    reshape into hop blocks + row gather of R consecutive blocks.
    General path: element-index gather.
    """
    xp = array_namespace(x)
    hop = nperseg - noverlap
    N = x.shape[axis]
    F = (N - nperseg) // hop + 1
    if F < 1:
        raise ValueError(
            f'input size {N} is too small for nperseg={nperseg} frames'
        )

    if nperseg % hop == 0:
        R = nperseg // hop
        M = N // hop
        xtrim = x[_axis_tuple(x.ndim, axis, slice(0, M * hop))]
        shape_blocks = x.shape[:axis] + (M, hop) + x.shape[axis + 1 :]
        blocks = xtrim.reshape(shape_blocks)

        rows = (np.arange(F)[:, None] + np.arange(R)[None, :]).reshape(-1)
        frames = xp.take(blocks, rows, axis=axis)
        shape_frames = x.shape[:axis] + (F, nperseg) + x.shape[axis + 1 :]
        return frames.reshape(shape_frames)

    # general hop: element gather
    idx = (np.arange(F)[:, None] * hop + np.arange(nperseg)[None, :]).reshape(-1)
    frames = xp.take(x, idx, axis=axis)
    shape_frames = x.shape[:axis] + (F, nperseg) + x.shape[axis + 1 :]
    return frames.reshape(shape_frames)


def _window_dtype_like(w, x, xp):
    """cast the (possibly fftshift-baked) window toward x's dtype without
    corrupting it: for odd nfft the baked fftshift ramp is complex, and
    the reference casts it to a real input's dtype, silently zeroing the
    shift's imaginary part (reference fourier.py:1026 — docs/PARITY.md).
    Keep the complex window intact and let the multiply promote; the
    stft output is complex after the FFT either way."""
    if xp.iscomplexobj(w) and not xp.iscomplexobj(x):
        return w
    return w.astype(x.dtype)


def _stack_stft_windows(x, window, nperseg: int, noverlap: int, norm=None, axis=0, out=None):
    """overlapping windowed frames (reference fourier.py:545-581).

    ``window`` is the (possibly fftshift-baked) window divided by nfft, as
    passed by stft(); scale normalization matches fourier.py:571-578.
    """
    xp = array_namespace(x)

    hop_size = nperseg - noverlap
    xstacked = _gather_frames(x, nperseg, noverlap, axis=axis)

    if norm == 'power':
        scale = 1
    elif norm is None:
        # COLA normalization: hop-strided window taps sum to the overlap gain
        scale = xp.abs(window[::hop_size]).sum()
    else:
        raise ValueError(
            f"invalid normalization argument '{norm}' (should be 'power' or None)"
        )

    w = broadcast_onto(window / scale, xstacked, axis=axis + 1)
    return xstacked * _window_dtype_like(w, xstacked, xp)


def _unstack_stft_windows(y, noverlap: int, nperseg: int, axis=0, out=None, extra=0):
    """grouped overlap-add reconstruction (reference fourier.py:584-649).

    Sums shifted groups of non-overlapping frames in nfft//hop static
    passes; each pass is a reshape + slice + add, which XLA lowers without
    any scatter.
    """
    xp = array_namespace(y)

    nfft = nperseg
    hop_size = nperseg - noverlap
    R = nfft // hop_size

    F = y.shape[axis]
    waveform_size = F * y.shape[axis + 1] * hop_size // nfft + noverlap
    target_shape = y.shape[:axis] + (waveform_size,) + y.shape[axis + 2 :]

    xr = xp.zeros(target_shape, dtype=y.dtype)

    for offs in range(R):
        yslice = y[_axis_tuple(y.ndim, axis, slice(offs, None, R))]
        yshape = yslice.shape
        merged = yshape[:axis] + (yshape[axis] * yshape[axis + 1],) + yshape[axis + 2 :]
        yslice = yslice.reshape(merged)

        start = offs * hop_size
        length = min(yslice.shape[axis], waveform_size - start)
        ysel = yslice[_axis_tuple(yslice.ndim, axis, slice(0, length))]

        if xp is jnp:
            xr = xr.at[_axis_tuple(xr.ndim, axis, slice(start, start + length))].add(ysel)
        else:
            xr[_axis_tuple(xr.ndim, axis, slice(start, start + length))] += ysel

    return xr


def stft(
    x,
    *,
    fs: float,
    window,
    nperseg: int = 256,
    noverlap: int = 0,
    nzero: int = 0,
    axis: int = 0,
    truncate: bool = True,
    norm: str | None = None,
    overwrite_x=False,
    return_axis_arrays: bool = True,
    out=None,
    fft_backend: str = 'auto',
):
    """short-time Fourier transform (reference fourier.py:927-1057).

    Args:
        x: input waveform array (numpy or jax; complex or real)
        fs: sample rate
        window: a window vector, or a name / (name, parameter) pair as in
            scipy.signal.get_window (plus the extra windows in ops.windows)
        nperseg: segment (FFT) size
        noverlap: overlap between adjacent FFT windows, in samples
        nzero: number of zeroed window samples (for fractional windows)
        axis: waveform axis
        truncate: allow truncation of x to whole fft blocks (noverlap==0)
        norm: None or 'power' (RMS-normalized window)
        fft_backend: 'xla', 'mxu' (four-step DFT matmuls, ops.mxu_fft;
            much faster on TPU for composite sizes), or 'auto' (default:
            'mxu' on TPU targets when nperseg qualifies, else 'xla' —
            ops.fft.resolve_fft_backend; matches the reference's policy
            of auto-picking its fastest backend, fourier.py:1476-1495)

    Returns:
        (freqs, times, Y) or Y if return_axis_arrays is False. Frequencies
        are monotonic (fftshift is baked into the window).
    """
    xp = array_namespace(x)

    nfft = nperseg

    if nperseg < 1:
        raise ValueError(f'nperseg must be a positive integer, not {nperseg}')
    if x.size == 0:
        raise ValueError('stft input is empty')
    if x.shape[axis] < nperseg:
        raise ValueError(
            f'stft input holds {x.shape[axis]} samples along the axis — '
            f'shorter than one nperseg={nperseg} frame'
        )
    if not 0 <= noverlap < nperseg:
        raise ValueError(
            f'noverlap ({noverlap}) must be in [0, nperseg) = [0, {nperseg})'
        )

    if norm not in ('power', None):
        raise TypeError('norm must be "power" or None')

    window = 'rect' if window is None else window

    # windows are built and cached in host numpy: a cached device-resident
    # window closed over by a later jit trace would need a device->host
    # copy at lowering (unsupported for complex dtypes on the axon tunnel);
    # numpy constants embed into traces directly
    named_window = isinstance(window, str) or (
        isinstance(window, tuple) and isinstance(window[0], str)
    )
    if named_window:
        w = get_window(
            window,
            nfft - nzero,
            nzero=nzero,
            xp=np,
            dtype=x.dtype,
            norm=(norm == 'power'),
            fftshift=True,
        )
    else:
        # a precomputed window vector: apply the baked fftshift pattern
        # (reference fourier.py:1011-1014 intends this; its use of an
        # undefined name `w` on the rhs is a reference bug not reproduced).
        # multiplication promotes to the window's own backend, so jax
        # window vectors (including tracers) pass through unconverted
        w = window * get_window(
            'rect', nfft - nzero, nzero=nzero, xp=np, dtype=x.dtype, fftshift=True
        )

    if noverlap == 0:
        # special case for speed (reference fourier.py:1016-1028)
        xstack = to_blocks(x, nfft, axis=axis, truncate=truncate)
        wstack = broadcast_onto(w / nfft, xstack, axis=axis + 1)
        xstack = xstack * _window_dtype_like(wstack, xstack, xp)
    else:
        xstack = _stack_stft_windows(
            x,
            window=w / nfft,
            nperseg=nperseg,
            noverlap=noverlap,
            axis=axis,
            norm=norm,
        )

    # the window carries the baked-in alternating-sign delay ramp, so the
    # spectrum comes out already centered — no fftshift pass here
    y = fft(xstack, axis=axis + 1, backend=fft_backend)

    if not return_axis_arrays:
        return y
    freqs, times = _get_stft_axes(
        fs, nfft=nfft, time_size=y.shape[axis], overlap_frac=noverlap / nfft, xp=np
    )
    return freqs, times, y


def istft(
    y,
    size=None,
    *,
    nfft: int,
    noverlap: int,
    out=None,
    overwrite_x=False,
    axis: int = 0,
    fft_backend: str = 'auto',
):
    """reconstruct a waveform from its STFT (reference fourier.py:1060-1104).

    fft_backend: 'xla', 'mxu', or 'auto' (see stft)."""
    xp = array_namespace(y)

    if not xp.iscomplexobj(y):
        # casting the shift-corrected frames back to a real dtype would
        # silently discard the imaginary parts (same failure class as
        # the stft real-input odd-nperseg bug, docs/PARITY.md)
        raise ValueError('istft input must be a complex STFT array')

    frame_axis = axis if axis >= 0 else axis + y.ndim
    if y.ndim < frame_axis + 2:
        raise ValueError(
            f'istft input must have an fft axis after axis={axis}: '
            f'expected >= {frame_axis + 2} dims, got shape {y.shape}'
        )
    if y.shape[frame_axis + 1] != nfft:
        raise ValueError(
            f'istft fft axis has size {y.shape[frame_axis + 1]}, expected '
            f'nfft={nfft}'
        )

    xstack = ifft(y, axis=axis + 1, backend=fft_backend)

    # correct the fft shift in the time domain (host-cached window; see
    # the constant-embedding note in stft())
    w = get_window('rect', nfft, xp=np, dtype=y.dtype, fftshift=True)
    wstack = broadcast_onto(w, xstack, axis=axis + 1)
    xstack = (xstack * wstack).astype(y.dtype)

    x = _unstack_stft_windows(xstack, noverlap=noverlap, nperseg=nfft, axis=axis)

    if size is not None:
        trim = x.shape[axis] - size
        if trim > 0:
            x = x[_axis_tuple(x.ndim, axis, slice(trim // 2, -(trim - trim // 2)))]

    return x


def spectrogram(
    x,
    *,
    fs: float,
    window,
    nperseg: int = 256,
    noverlap: int = 0,
    nzero: int = 0,
    axis: int = 0,
    truncate: bool = True,
    return_axis_arrays: bool = True,
    fft_backend: str = 'auto',
):
    """power spectrogram, scaled so noise bandwidth equals the frequency
    resolution (reference fourier.py:1203-1233).

    fft_backend: 'xla', 'mxu', or 'auto' (see stft)."""
    ret = stft(
        x,
        fs=fs,
        window=window,
        nperseg=nperseg,
        noverlap=noverlap,
        nzero=nzero,
        axis=axis,
        truncate=truncate,
        norm='power',
        return_axis_arrays=return_axis_arrays,
        fft_backend=fft_backend,
    )

    if not return_axis_arrays:
        return power_analysis.envtopow(ret)

    freqs, times, X = ret
    return freqs, times, power_analysis.envtopow(X)
