"""STFT/ISTFT/spectrogram parity tests.

Oracle: direct float64 numpy computation of the reference STFT semantics
(fourier.py:927-1057): frames at hop offsets, window with baked fftshift
scaled by 1/nfft (and COLA scale for norm=None), batched FFT.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage
import scipy.signal

from iqwaveform_tpu import fourier

from conftest import make_tone_noise


def oracle_stft(x, window, nperseg, noverlap, norm=None):
    """float64 reference-semantics STFT for 1-D input, axis=0."""
    w = scipy.signal.get_window(window, nperseg).astype('float64')
    if norm == 'power':
        w = w / np.sqrt(np.mean(np.abs(w) ** 2))
    delay = scipy.ndimage.fourier_shift(np.ones(nperseg), nperseg // 2)
    if nperseg % 2 == 0:
        delay = delay.real
    w = (w * delay).astype('complex128' if np.iscomplexobj(delay) else 'float64')

    hop = nperseg - noverlap
    if noverlap == 0:
        n_frames = x.shape[0] // nperseg
        frames = x[: n_frames * nperseg].reshape(n_frames, nperseg)
        wind = w / nperseg
    else:
        frames = np.lib.stride_tricks.sliding_window_view(x, nperseg)[::hop]
        wind = w / nperseg
        if norm is None:
            wind = wind / np.abs(wind[::hop]).sum()
    return np.fft.fft(frames.astype('complex128') * wind, axis=1)


@pytest.mark.parametrize('noverlap_frac', [0, 0.5])
@pytest.mark.parametrize('window', ['hann', 'hamming', 'blackman'])
def test_stft_matches_oracle(window, noverlap_frac):
    nperseg = 256
    noverlap = int(nperseg * noverlap_frac)
    x = make_tone_noise(nperseg * 32)

    expected = oracle_stft(x, window, nperseg, noverlap)
    freqs, times, Y = fourier.stft(
        x, fs=1e6, window=window, nperseg=nperseg, noverlap=noverlap
    )
    assert Y.shape == expected.shape
    scale = np.abs(expected).max()
    np.testing.assert_allclose(Y, expected, atol=2e-6 * scale)

    Yj = fourier.stft(
        jnp.asarray(x),
        fs=1e6,
        window=window,
        nperseg=nperseg,
        noverlap=noverlap,
        return_axis_arrays=False,
    )
    np.testing.assert_allclose(np.asarray(Yj), expected, atol=2e-6 * scale)


def test_stft_blackman_third_overlap():
    # hop = nperseg/3 exercises the R=3 block-gather path
    nperseg = 255
    noverlap = 170
    x = make_tone_noise(nperseg * 24)
    expected = oracle_stft(x, 'blackman', nperseg, noverlap)
    Y = fourier.stft(
        x, fs=1e6, window='blackman', nperseg=nperseg, noverlap=noverlap,
        return_axis_arrays=False,
    )
    scale = np.abs(expected).max()
    np.testing.assert_allclose(Y, expected, atol=2e-6 * scale)


def test_stft_general_hop():
    # hop that does not divide nperseg exercises the general gather path
    nperseg = 256
    noverlap = 100
    x = make_tone_noise(nperseg * 16)
    expected = oracle_stft(x, 'hann', nperseg, noverlap)
    Yj = fourier.stft(
        jnp.asarray(x), fs=1e6, window='hann', nperseg=nperseg, noverlap=noverlap,
        return_axis_arrays=False,
    )
    scale = np.abs(expected).max()
    np.testing.assert_allclose(np.asarray(Yj), expected, atol=2e-6 * scale)


def test_stft_axes_arrays():
    x = make_tone_noise(4096)
    freqs, times, Y = fourier.stft(x, fs=1e6, window='hann', nperseg=256)
    assert freqs.shape == (256,)
    # monotonic frequencies, no fftshift needed
    assert np.all(np.diff(freqs) > 0)
    assert freqs[0] == -5e5
    np.testing.assert_allclose(times[1] - times[0], 256 / 1e6)


def test_stft_tone_bin_location():
    fs = 1e6
    nperseg = 1024
    f_tone = 125e3  # an exact bin
    x = make_tone_noise(nperseg * 64, fs=fs, f_tone=f_tone, snr_db=60)
    freqs, times, Y = fourier.stft(x, fs=fs, window='hann', nperseg=nperseg)
    peak_bin = np.abs(Y).mean(axis=0).argmax()
    np.testing.assert_allclose(freqs[peak_bin], f_tone)


def test_stft_multidim_axis():
    x = np.stack([make_tone_noise(4096, seed=i) for i in range(3)], axis=0)
    Y = fourier.stft(
        x, fs=1e6, window='hann', nperseg=256, noverlap=128, axis=1,
        return_axis_arrays=False,
    )
    Y0 = fourier.stft(
        x[0], fs=1e6, window='hann', nperseg=256, noverlap=128, axis=0,
        return_axis_arrays=False,
    )
    np.testing.assert_allclose(Y[0], Y0, atol=1e-6)

    Yj = fourier.stft(
        jnp.asarray(x), fs=1e6, window='hann', nperseg=256, noverlap=128, axis=1,
        return_axis_arrays=False,
    )
    np.testing.assert_allclose(np.asarray(Yj), Y, atol=1e-5)


@pytest.mark.parametrize('window,overlap_frac', [
    ('hamming', 1 / 2),
    ('blackman', 2 / 3),
    ('blackmanharris', 4 / 5),
])
def test_istft_cola_roundtrip(window, overlap_frac):
    """COLA reconstruction: interior samples must match the input."""
    fs = 1e6
    nfft = 510 if window == 'blackman' else 512
    if window == 'blackmanharris':
        nfft = 500
    noverlap = round(nfft * overlap_frac)
    x = make_tone_noise(nfft * 40)

    Y = fourier.stft(
        x, fs=fs, window=window, nperseg=nfft, noverlap=noverlap,
        truncate=False, return_axis_arrays=False,
    )
    xr = fourier.istft(Y, nfft=nfft, noverlap=noverlap)

    core = slice(nfft, min(xr.shape[0], x.shape[0]) - nfft)
    err = np.abs(np.asarray(xr)[core] - x[core]).max() / np.abs(x).max()
    assert err < 1e-5

    # jax path identical
    Yj = fourier.stft(
        jnp.asarray(x), fs=fs, window=window, nperseg=nfft, noverlap=noverlap,
        truncate=False, return_axis_arrays=False,
    )
    xrj = fourier.istft(Yj, nfft=nfft, noverlap=noverlap)
    np.testing.assert_allclose(np.asarray(xrj), np.asarray(xr), atol=2e-5)


def test_istft_size_trim():
    x = make_tone_noise(512 * 16)
    Y = fourier.stft(
        x, fs=1e6, window='hamming', nperseg=512, noverlap=256,
        truncate=False, return_axis_arrays=False,
    )
    xr = fourier.istft(Y, 512 * 16, nfft=512, noverlap=256)
    assert xr.shape[0] == 512 * 16


def test_spectrogram_power_scaling():
    """white noise PSD should equal noise power / resolution bandwidth."""
    rng = np.random.default_rng(0)
    n = 1024 * 256
    noise_power = 2.0
    x = (
        np.sqrt(noise_power / 2) * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    ).astype('complex64')
    freqs, times, spg = fourier.spectrogram(
        x, fs=1e6, window='hann', nperseg=1024
    )
    total = spg.sum(axis=1).mean()
    np.testing.assert_allclose(total, noise_power, rtol=0.05)


def test_stft_jit_traceable():
    """public stft must be traceable inside user jit code."""
    x = jnp.asarray(make_tone_noise(4096))

    @jax.jit
    def pipeline(x):
        return fourier.stft(
            x, fs=1e6, window='hann', nperseg=256, noverlap=128,
            return_axis_arrays=False,
        )

    Y = pipeline(x)
    expected = oracle_stft(np.asarray(x), 'hann', 256, 128)
    np.testing.assert_allclose(
        np.asarray(Y), expected, atol=2e-6 * np.abs(expected).max()
    )


def test_stft_invalid_norm():
    x = make_tone_noise(1024)
    with pytest.raises(TypeError):
        fourier.stft(x, fs=1e6, window='hann', nperseg=256, norm='bogus')
