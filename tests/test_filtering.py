"""Filtering / resampler design / OLA pipeline tests.

Oracles: scipy.signal.resample (fourier.py:1550 cites it), analytic
bandpass behavior on known tones, numpy/jax path equivalence.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from iqwaveform_tpu import fourier

from conftest import make_tone_noise


def test_fftfreq_monotonic_and_values():
    f = fourier.fftfreq(8, 1 / 8.0)
    np.testing.assert_allclose(f, [-4, -3, -2, -1, 0, 1, 2, 3])
    f9 = fourier.fftfreq(9, 1 / 9.0)
    assert np.all(np.diff(f9) > 0)
    np.testing.assert_allclose(f9, np.sort(np.fft.fftfreq(9, 1 / 9.0)), atol=1e-12)


def test_fft_ifft_roundtrip():
    x = make_tone_noise(1024)
    np.testing.assert_allclose(fourier.ifft(fourier.fft(x)), x, atol=1e-6)
    xj = jnp.asarray(x)
    np.testing.assert_allclose(
        np.asarray(fourier.ifft(fourier.fft(xj))), x, atol=1e-5
    )


@pytest.mark.parametrize('num_ratio', [0.5, 0.25, 2.0])
def test_resample_matches_scipy(num_ratio):
    n = 4096
    x = make_tone_noise(n, fs=1e6, f_tone=1e5, snr_db=40)
    num = int(n * num_ratio)
    ours = fourier.resample(x, num)
    theirs = scipy.signal.resample(x.astype('complex128'), num)
    scale = np.abs(theirs).max()
    # time domain: loose tolerance (the reference design slices the band
    # edge bin instead of folding it as scipy does)
    np.testing.assert_allclose(ours, theirs, atol=5e-3 * scale)

    # spectrum: tight equality away from the two band-edge bins
    F_ours = np.fft.fftshift(np.fft.fft(ours))
    F_theirs = np.fft.fftshift(np.fft.fft(theirs))
    interior = slice(2, num - 2)
    np.testing.assert_allclose(
        F_ours[interior], F_theirs[interior], atol=2e-3 * np.abs(F_theirs).max()
    )

    ours_j = fourier.resample(jnp.asarray(x), num)
    np.testing.assert_allclose(np.asarray(ours_j), ours, atol=1e-4 * scale)


def test_resample_multidim_upsample_shape():
    # regression (scripts/fuzz_parity.py): upsampling a 2-D array along
    # axis 0 used to pad every axis ((148, 3) -> (212, 67)) through the
    # reference's pad_along_axis bug
    rng = np.random.default_rng(7)
    x = (
        rng.standard_normal((148, 3)) + 1j * rng.standard_normal((148, 3))
    ).astype('complex64')
    got = fourier.resample(x, 212, axis=0)
    assert got.shape == (212, 3)
    ref = scipy.signal.resample(x.astype('complex128'), 212, axis=0)
    # per-column equality with the documented band-edge-bin deviation:
    # when upsampling, the deviation sits at the ORIGINAL band's edge
    # bins (rows pad and pad+148 of the fftshifted output), not at the
    # output edges — mask those rows and compare everything else
    F_got = np.fft.fftshift(np.fft.fft(got, axis=0), axes=0)
    F_ref = np.fft.fftshift(np.fft.fft(ref, axis=0), axes=0)
    pad = (212 - 148) // 2
    keep = np.ones(212, bool)
    keep[[pad, pad + 148]] = False
    np.testing.assert_allclose(
        F_got[keep], F_ref[keep], atol=2e-3 * np.abs(F_ref).max()
    )
    got_j = fourier.resample(jnp.asarray(x), 212, axis=0)
    np.testing.assert_allclose(
        np.asarray(got_j), got, atol=1e-4 * np.abs(got).max()
    )


def test_resample_preserves_tone():
    fs = 1e6
    n = 8192
    f_tone = 62.5e3
    x = make_tone_noise(n, fs=fs, f_tone=f_tone, snr_db=80)
    y = fourier.resample(x, n // 2)
    # tone should land at the same frequency in the new rate
    spec = np.abs(np.fft.fft(np.asarray(y)))
    peak = np.fft.fftfreq(n // 2, 2 / fs)[spec.argmax()]
    np.testing.assert_allclose(peak, f_tone, atol=fs / n)


def test_resample_validates():
    x = make_tone_noise(100)
    with pytest.raises(ValueError):
        fourier.resample(x, 50, domain='bogus')
    with pytest.raises(ValueError):
        fourier.resample(x, 200, shift=10)  # shift while upsampling


@pytest.mark.parametrize('n_in,n_out', [(101, 51), (100, 51), (101, 50)])
def test_resample_odd_sizes(n_in, n_out):
    """odd sizes use the explicit-fftshift fallback (the reference raises
    for odd input, fourier.py:1572-1573, breaking the sync loop)."""
    x = make_tone_noise(n_in, fs=1e6, f_tone=1e5, snr_db=40)
    ours = fourier.resample(x, n_out)
    theirs = scipy.signal.resample(x.astype('complex128'), n_out)
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, atol=1e-2 * scale)


def test_resample_identity():
    x = make_tone_noise(256)
    assert fourier.resample(x, 256) is x


def test_time_fftshift_matches_fft_shift():
    """multiplying by (-1)^n in time == fftshift in frequency."""
    x = make_tone_noise(1024)
    shifted = fourier.time_fftshift(x.copy())
    F1 = np.fft.fft(shifted)
    F2 = np.fft.fftshift(np.fft.fft(x))
    np.testing.assert_allclose(F1, F2, atol=1e-3)


def test_design_cola_resampler_basic():
    d = fourier.design_cola_resampler(122.88e6, 61.44e6, window='hamming')
    assert d['nfft'] % 2 == 0 and d['nfft_out'] % 2 == 0
    assert d['fs'] == d['fs_sdr']
    np.testing.assert_allclose(d['fs_sdr'] / 61.44e6, d['nfft'] / d['nfft_out'])


def test_design_cola_resampler_fractional():
    # non-integer ratio forces a true rational design
    d = fourier.design_cola_resampler(61.44e6, 30.72e6 * 1.5, window='hamming')
    ratio = d['nfft'] / d['nfft_out']
    np.testing.assert_allclose(d['fs_sdr'] / (30.72e6 * 1.5), ratio, rtol=1e-9)


def test_design_cola_resampler_shift():
    d = fourier.design_cola_resampler(
        122.88e6, 20e6, bw=10e6, shift='left', window='hamming'
    )
    assert d['lo_offset'] < 0
    assert d['passband'][0] == d['lo_offset'] - 5e6


def test_design_cola_resampler_validation():
    with pytest.raises(ValueError):
        fourier.design_cola_resampler(10e6, 5e6, shift='up', bw=1e6)
    with pytest.raises(ValueError):
        fourier.design_cola_resampler(10e6, 5e6, shift='left')  # no bw


def test_design_fir_resampler():
    fs, kws = fourier.design_fir_resampler(61.44e6, 30.72e6)
    assert kws['up'] >= 1 and kws['down'] >= 1
    np.testing.assert_allclose(fs * kws['up'] / kws['down'], 30.72e6)


def test_prime_fft_sizes():
    primes = fourier._prime_fft_sizes(100)
    assert 101 in primes
    assert 997 in primes
    assert 1024 not in primes
    assert np.all(primes > 100)


def test_ola_filter_parameters():
    nfft_out, noverlap, scale, pad = fourier._ola_filter_parameters(
        8192, window='hamming', nfft_out=None, nfft=512, extend=False
    )
    assert nfft_out == 512 and noverlap == 256 and scale == 0.5
    with pytest.raises(TypeError):
        fourier._ola_filter_parameters(
            8192, window='kaiser', nfft_out=None, nfft=512, extend=False
        )
    with pytest.raises(ValueError):
        fourier._ola_filter_parameters(
            8192, window='blackman', nfft_out=511, nfft=511, extend=False
        )


def test_ola_filter_bandpass_rejection():
    """out-of-band tone must be strongly attenuated; in-band preserved."""
    fs = 1e6
    nfft = 512
    n = nfft * 64
    t = np.arange(n) / fs
    in_band = np.exp(2j * np.pi * 50e3 * t)
    out_band = np.exp(2j * np.pi * 300e3 * t)
    x = (in_band + out_band).astype('complex64')

    y = fourier.ola_filter(
        x, fs=fs, nfft=nfft, window='hamming', passband=(-100e3, 100e3)
    )
    y = np.asarray(y)

    spec = np.abs(np.fft.fft(y[nfft:-nfft]))
    freqs = np.fft.fftfreq(y[nfft:-nfft].size, 1 / fs)
    p_in = spec[np.abs(freqs - 50e3).argmin()]
    p_out = spec[np.abs(freqs - 300e3).argmin()]
    assert p_out < p_in * 1e-3

    # jax path matches
    yj = fourier.ola_filter(
        jnp.asarray(x), fs=fs, nfft=nfft, window='hamming', passband=(-100e3, 100e3)
    )
    np.testing.assert_allclose(np.asarray(yj), y, atol=1e-4)


def test_ola_filter_resample():
    fs = 1e6
    nfft = 512
    nfft_out = 256
    n = nfft * 64
    x = make_tone_noise(n, fs=fs, f_tone=50e3, snr_db=60)
    y = fourier.ola_filter(
        x,
        fs=fs,
        nfft=nfft,
        nfft_out=nfft_out,
        window='hamming',
        passband=(-100e3, 100e3),
    )
    assert np.asarray(y).shape[0] == n // 2
    # tone frequency preserved at the new rate
    yc = np.asarray(y)[nfft:-nfft]
    spec = np.abs(np.fft.fft(yc))
    peak = np.fft.fftfreq(yc.size, 2 / fs)[spec.argmax()]
    np.testing.assert_allclose(peak, 50e3, atol=fs / nfft)


@pytest.mark.parametrize('updown', [(256, 512), (512, 256), (384, 512)])
def test_oaresample_rate_and_tone(updown):
    up, down = updown
    fs = 1e6
    n = 512 * 48
    f_tone = 31.25e3
    x = make_tone_noise(n, fs=fs, f_tone=f_tone, snr_db=80)
    y = np.asarray(fourier.oaresample(x, up, down, fs, axis=0))
    assert y.shape[0] == n * up // down

    fs_out = fs * up / down
    core = y[1024:-1024]
    spec = np.abs(np.fft.fft(core))
    peak = np.fft.fftfreq(core.size, 1 / fs_out)[spec.argmax()]
    np.testing.assert_allclose(peak, f_tone, atol=fs / 256)

    # amplitude approximately preserved
    np.testing.assert_allclose(
        np.abs(core).mean(), np.abs(x).mean(), rtol=0.05
    )


@pytest.mark.parametrize('updown', [(0, 512), (512, 0), (-1, 256), (512, 256.5)])
def test_oaresample_rejects_nonpositive_rates(updown):
    up, down = updown
    x = make_tone_noise(4096, fs=1e6, f_tone=31.25e3, snr_db=40)
    with pytest.raises(ValueError, match='positive'):
        fourier.oaresample(x, up, down, 1e6, axis=0)


def test_zero_stft_by_freq():
    fs = 1e6
    x = make_tone_noise(512 * 16, fs=fs)
    freqs, times, Y = fourier.stft(x, fs=fs, window='hamming', nperseg=512, noverlap=256)
    Yz = fourier.zero_stft_by_freq(freqs, Y.copy(), passband=(-100e3, 100e3), axis=0)
    band = (freqs < -100e3) | (freqs > 100e3 + fs / 512)
    assert np.abs(Yz[:, band]).max() == 0
    inband = (freqs > -90e3) & (freqs < 90e3)
    assert np.abs(Yz[:, inband]).max() > 0

    Yzj = fourier.zero_stft_by_freq(
        freqs, jnp.asarray(Y), passband=(-100e3, 100e3), axis=0
    )
    np.testing.assert_allclose(np.asarray(Yzj), Yz, atol=1e-6)


def test_downsample_stft():
    fs = 1e6
    x = make_tone_noise(512 * 16, fs=fs, f_tone=50e3, snr_db=60)
    freqs, times, Y = fourier.stft(x, fs=fs, window='hamming', nperseg=512, noverlap=256)
    freqs2, Y2 = fourier.downsample_stft(freqs, Y, nfft_out=256, axis=0)
    assert Y2.shape == (Y.shape[0], 256)
    assert freqs2.shape == (256,)
    # center half of the band retained
    np.testing.assert_allclose(Y2, Y[:, 128:384], atol=1e-7)


def test_stft_fir_lowpass():
    fs = 1e6
    x = make_tone_noise(512 * 16, fs=fs)
    Y = fourier.stft(
        x, fs=fs, window='hamming', nperseg=512, noverlap=256,
        return_axis_arrays=False,
    )
    Yf = fourier.stft_fir_lowpass(
        Y, sample_rate=fs, bandwidth=200e3, transition_bandwidth=50e3, axis=0
    )
    assert Yf.shape == Y.shape
    Yfj = fourier.stft_fir_lowpass(
        jnp.asarray(Y), sample_rate=fs, bandwidth=200e3, transition_bandwidth=50e3,
        axis=0,
    )
    np.testing.assert_allclose(np.asarray(Yfj), np.asarray(Yf), atol=1e-5)


def test_design_fir_lpf():
    taps = fourier.design_fir_lpf(
        400e3, 1e6, numtaps=101, transition_bandwidth=100e3
    )
    assert taps.shape == (101,)
    w, h = scipy.signal.freqz(np.asarray(taps, dtype='float64'), fs=1e6)
    h = np.abs(h)
    assert h[w < 150e3].min() > 0.9
    assert h[w > 300e3].max() < 0.2


def test_istft_buffer_size():
    size = fourier._istft_buffer_size(
        8192, window='hamming', nfft_out=None, nfft=512, extend=False
    )
    assert size >= 8192


# --- fused factored OLA route (fft_backend='mxu'/'pallas', VERDICT r4 #4) ---


def _fused_case(nfft=4096, nfft_out=2048, n_frames=6):
    rng = np.random.default_rng(3)
    n = nfft * n_frames
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        'complex64'
    )
    kw = dict(
        fs=10e6, nfft=nfft, window='hamming',
        passband=(-3e6, 3e6), nfft_out=nfft_out,
    )
    return jnp.asarray(x), kw


@pytest.mark.parametrize('backend', ['mxu', 'pallas'])
def test_ola_filter_fused_matches_xla(backend):
    """the fused factored route (the monitor's production transform, on
    the public frame set) must equal the stft->zero->trim->istft stage
    chain at float32 tolerance."""
    xj, kw = _fused_case()
    y_xla = np.asarray(fourier.ola_filter(xj, fft_backend='xla', **kw))
    y_f = np.asarray(
        fourier.ola_filter(
            xj, fft_backend=backend, fft_precision='highest', **kw
        )
    )
    assert y_f.shape == y_xla.shape
    scale = np.abs(y_xla).max()
    assert np.abs(y_f - y_xla).max() / scale < 2e-6


def test_ola_filter_fused_production_tier():
    """fft_precision='high' (the 3-pass production tier) stays inside
    the framework's 1e-5-class budget on the public route too."""
    xj, kw = _fused_case()
    y_xla = np.asarray(fourier.ola_filter(xj, fft_backend='xla', **kw))
    y_f = np.asarray(
        fourier.ola_filter(xj, fft_backend='pallas', fft_precision='high', **kw)
    )
    scale = np.abs(y_xla).max()
    assert np.abs(y_f - y_xla).max() / scale < 5e-5


def test_ola_filter_fused_no_resample():
    """nfft_out == nfft (bandpass only): the fused route's full-width
    copy window must reproduce the pure zeroing path."""
    xj, kw = _fused_case(nfft_out=4096)
    y_xla = np.asarray(fourier.ola_filter(xj, fft_backend='xla', **kw))
    y_f = np.asarray(
        fourier.ola_filter(
            xj, fft_backend='mxu', fft_precision='highest', **kw
        )
    )
    scale = np.abs(y_xla).max()
    assert np.abs(y_f - y_xla).max() / scale < 2e-6


def test_ola_filter_fused_unsupported_raises():
    """explicit 'mxu' on a design the fused transform cannot align must
    raise (only 'auto' falls back quietly)."""
    xj, kw = _fused_case()
    kw = dict(kw, nfft_out=kw['nfft'] // 2 - 2)  # breaks COLA/fused align
    with pytest.raises(ValueError):
        fourier.ola_filter(xj, fft_backend='mxu', **kw)


def test_oaresample_fused_engages_via_auto(monkeypatch):
    """with the platform forced TPU-like, oaresample's 'auto' must take
    the fused route and match the XLA stage chain."""
    from iqwaveform_tpu.ops.pallas import _common

    xj, _ = _fused_case()
    kw = dict(window='hamming', axis=0)
    y_xla = np.asarray(
        fourier.oaresample(xj, 2048, 4096, 10e6, fft_backend='xla', **kw)
    )
    monkeypatch.setattr(_common, 'on_tpu_like', lambda: True)
    y_auto = np.asarray(fourier.oaresample(xj, 2048, 4096, 10e6, **kw))
    scale = np.abs(y_xla).max()
    assert np.abs(y_auto - y_xla).max() / scale < 5e-5


def test_oaresample_fused_frequency_shift(monkeypatch):
    """the fused route must reproduce the shifted copy window."""
    from iqwaveform_tpu.ops.pallas import _common

    xj, _ = _fused_case()
    fs = 10e6
    shift = 512 * fs / 4096  # 512 bins: a-aligned for the fused window
    kw = dict(window='hamming', axis=0, frequency_shift=shift)
    y_xla = np.asarray(
        fourier.oaresample(xj, 2048, 4096, fs, fft_backend='xla', **kw)
    )
    monkeypatch.setattr(_common, 'on_tpu_like', lambda: True)
    y_auto = np.asarray(fourier.oaresample(xj, 2048, 4096, fs, **kw))
    scale = np.abs(y_xla).max()
    assert np.abs(y_auto - y_xla).max() / scale < 5e-5
