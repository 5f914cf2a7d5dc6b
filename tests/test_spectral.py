"""power_spectral_density / channelize_power / iq_to_stft_spectrogram tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from iqwaveform_tpu import fourier, util

from conftest import make_tone_noise


def test_psd_statistics_stack_shapes_and_order():
    fs = 1e6
    x = make_tone_noise(1024 * 64, fs=fs)
    stats = ['0.25', '0.5', 'mean', 'max', 0.9]
    out = fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=fs / 1024, statistics=stats
    )
    assert out.shape == (5, 1024)
    assert out.dtype == np.float32
    # quantile ordering: q25 <= q50 <= q90 <= max
    assert np.all(out[0] <= out[1] + 1e-6)
    assert np.all(out[1] <= out[4] + 1e-6)
    assert np.all(out[4] <= out[3] + 1e-6)


def test_psd_matches_manual_quantiles():
    fs = 1e6
    nfft = 512
    x = make_tone_noise(nfft * 32, fs=fs)
    out = fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=fs / nfft, statistics=['0.5'], dB=True
    )
    freqs, times, spg = fourier.spectrogram(x, fs=fs, window='hann', nperseg=nfft)
    expected = np.quantile(10 * np.log10(spg + 1e-25), 0.5, axis=0)
    np.testing.assert_allclose(out[0], expected, atol=1e-3)


def test_psd_jax_matches_numpy():
    fs = 1e6
    x = make_tone_noise(512 * 32, fs=fs)
    stats = ['0.5', 'mean', 'max']
    a = fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=fs / 512, statistics=stats
    )
    b = fourier.power_spectral_density(
        jnp.asarray(x), fs=fs, window='hann', resolution=fs / 512, statistics=stats
    )
    np.testing.assert_allclose(np.asarray(b), a, atol=1e-2)


def test_psd_bandwidth_trim():
    fs = 1e6
    x = make_tone_noise(1024 * 16, fs=fs)
    out = fourier.power_spectral_density(
        x,
        fs=fs,
        window='hann',
        resolution=fs / 1024,
        bandwidth=fs / 2,
        statistics=['mean'],
    )
    assert out.shape[1] < 1024
    assert out.shape[1] >= 511


def test_psd_frequency_domain_input():
    fs = 1e6
    nfft = 512
    x = make_tone_noise(nfft * 32, fs=fs)
    X = fourier.stft(
        x, fs=fs, window='hann', nperseg=nfft, norm='power',
        return_axis_arrays=False,
    )
    with util.set_input_domain('frequency'):
        out = fourier.power_spectral_density(
            X, fs=fs, window='hann', resolution=fs / nfft, statistics=['mean']
        )
    direct = fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=fs / nfft, statistics=['mean']
    )
    np.testing.assert_allclose(out, direct, atol=1e-3)


def test_psd_validates_rates():
    x = make_tone_noise(4096)
    with pytest.raises(ValueError):
        fourier.power_spectral_density(
            x, fs=1e6, window='hann', resolution=333.33, statistics=['mean']
        )


def test_channelize_power_single_channel():
    fs = 1e6
    x = make_tone_noise(1024 * 32, fs=fs, f_tone=1e5, snr_db=30)
    times, power = fourier.channelize_power(
        x,
        1 / fs,
        512,
        analysis_bins_per_channel=256,
        window='hann',
        channel_count=1,
    )
    assert power.shape == times.shape
    assert np.all(np.asarray(power) > 0)


def test_channelize_power_multichannel_tone_location():
    fs = 1e6
    nch = 4
    fft_per_ch = 256
    # tone in channel 3 of 4 (channels ordered by monotonic frequency)
    f_tone = fs / 8  # +125 kHz
    x = make_tone_noise(fft_per_ch * nch * 32, fs=fs, f_tone=f_tone, snr_db=40)
    freqs, times, power = fourier.channelize_power(
        x,
        1 / fs,
        fft_per_ch,
        analysis_bins_per_channel=fft_per_ch,
        window='hann',
        channel_count=nch,
    )
    power = np.asarray(power)
    assert power.shape == (times.size, nch)
    # channel bands: [-500,-250), [-250,0), [0,250), [250,500) kHz
    assert power.mean(axis=0).argmax() == 2

    # jax path
    _, _, power_j = fourier.channelize_power(
        jnp.asarray(x),
        1 / fs,
        fft_per_ch,
        analysis_bins_per_channel=fft_per_ch,
        window='hann',
        channel_count=nch,
    )
    np.testing.assert_allclose(np.asarray(power_j), power, rtol=1e-4)

    # four-step MXU FFT backend matches
    _, _, power_m = fourier.channelize_power(
        jnp.asarray(x),
        1 / fs,
        fft_per_ch,
        analysis_bins_per_channel=fft_per_ch,
        window='hann',
        channel_count=nch,
        fft_backend='mxu',
    )
    np.testing.assert_allclose(np.asarray(power_m), power, rtol=1e-4)


def test_channelize_power_mxu_guard_fallbacks():
    """inputs the factored fast path cannot take (multi-dim iq, a
    precomputed window vector) must fall back to the stft path and
    still match the XLA backend."""
    import scipy.signal

    rng = np.random.default_rng(7)
    n, nch, fpc = 2**14, 8, 64
    x2 = (
        rng.standard_normal((n, 3)) + 1j * rng.standard_normal((n, 3))
    ).astype('complex64')

    # multi-dim iq: reference semantics channelize axis 0 per column
    _, _, c_ref = fourier.channelize_power(
        jnp.asarray(x2), 1e-6, fpc, analysis_bins_per_channel=48,
        window='hamming', channel_count=nch,
    )
    _, _, c_mxu = fourier.channelize_power(
        jnp.asarray(x2), 1e-6, fpc, analysis_bins_per_channel=48,
        window='hamming', channel_count=nch, fft_backend='mxu',
    )
    assert np.asarray(c_mxu).shape == np.asarray(c_ref).shape
    np.testing.assert_allclose(
        np.asarray(c_mxu), np.asarray(c_ref), rtol=1e-4
    )

    # precomputed window vector
    wv = scipy.signal.get_window('hamming', fpc * nch)
    x1 = x2[:, 0]
    _, _, v_ref = fourier.channelize_power(
        jnp.asarray(x1), 1e-6, fpc, analysis_bins_per_channel=48,
        window=wv, channel_count=nch,
    )
    _, _, v_mxu = fourier.channelize_power(
        jnp.asarray(x1), 1e-6, fpc, analysis_bins_per_channel=48,
        window=wv, channel_count=nch, fft_backend='mxu',
    )
    np.testing.assert_allclose(
        np.asarray(v_mxu), np.asarray(v_ref), rtol=1e-4
    )


def test_channelize_power_factored_path_matches_xla():
    """the fft_backend='mxu' factored-coordinate fast path (channel
    sums straight from four-step (k1, k2) coordinates, no transposed
    readout) returns identical freqs/times and matching power for
    trimmed and untrimmed analysis bandwidths."""
    rng = np.random.default_rng(5)
    x = (
        rng.standard_normal(2**16) + 1j * rng.standard_normal(2**16)
    ).astype('complex64')

    for nch, fpc, ab in [(64, 256, 192), (16, 128, 96), (8, 64, 64)]:
        f1, t1, c1 = fourier.channelize_power(
            jnp.asarray(x), 1e-6, fpc, analysis_bins_per_channel=ab,
            window='hamming', channel_count=nch,
        )
        f2, t2, c2 = fourier.channelize_power(
            jnp.asarray(x), 1e-6, fpc, analysis_bins_per_channel=ab,
            window='hamming', channel_count=nch, fft_backend='mxu',
        )
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        c1 = np.asarray(c1)
        np.testing.assert_allclose(
            np.asarray(c2), c1, atol=2e-6 * c1.max()
        )


def test_channelize_power_validates():
    x = make_tone_noise(4096)
    with pytest.raises(ValueError):
        fourier.channelize_power(
            x, 1e-6, 256, analysis_bins_per_channel=512, window='hann'
        )
    with pytest.raises(NotImplementedError):
        fourier.channelize_power(
            x, 1e-6, 256, analysis_bins_per_channel=128, window='hann', axis=1
        )


def test_iq_to_stft_spectrogram_dataframe():
    fs = 1e6
    x = make_tone_noise(1024 * 16, fs=fs)
    spg = fourier.iq_to_stft_spectrogram(x, 'hann', 1024, 1 / fs)
    assert isinstance(spg, pd.DataFrame)
    assert spg.shape[1] == 1024
    assert spg.columns[0] == -fs / 2


def test_iq_to_stft_spectrogram_bandwidth_trim():
    fs = 1e6
    x = make_tone_noise(1024 * 16, fs=fs)
    spg = fourier.iq_to_stft_spectrogram(
        x, 'hann', 1024, 1 / fs, analysis_bandwidth=fs / 2
    )
    assert spg.shape[1] == 512


def test_time_to_frequency():
    fs = 1e6
    x = make_tone_noise(4096, fs=fs, f_tone=1.25e5, snr_db=50)
    freqs, X = fourier.time_to_frequency(x, 1 / fs)
    assert freqs.shape == X.shape
    peak_freq = freqs[np.abs(np.asarray(X)).argmax()]
    np.testing.assert_allclose(peak_freq, 1.25e5, atol=fs / 4096)


def test_psd_factored_backend_matches_xla():
    """fft_backend='mxu' computes identical statistics through the
    factored transform + end unscramble (VERDICT r2 #4)."""
    fs = 1e6
    nfft = 512
    x = jnp.asarray(make_tone_noise(nfft * 64, fs=fs))
    stats = ['0.5', 'mean', 'max', 'min', 0.95]
    a = fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=fs / nfft, statistics=stats
    )
    b = fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=fs / nfft, statistics=stats,
        fft_backend='mxu',
    )
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-3)

    # bandwidth trim composes with the fast path
    a2 = fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=fs / nfft, statistics=['max'],
        bandwidth=fs / 2,
    )
    b2 = fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=fs / nfft, statistics=['max'],
        bandwidth=fs / 2, fft_backend='mxu',
    )
    assert b2.shape == a2.shape
    np.testing.assert_allclose(np.asarray(b2), np.asarray(a2), atol=1e-3)


def test_psd_histogram_quantiles_match_exact():
    """quantile_method='histogram' replaces the full per-bin sort with
    histogram inversion: quantiles within bin resolution, named stats
    near-exact (VERDICT r2 #4)."""
    fs = 1e6
    nfft = 1024
    x = jnp.asarray(make_tone_noise(nfft * 128 * 2, fs=fs))
    stats = ['mean', 0.5, 'max', 0.99]
    exact = fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=fs / nfft, statistics=stats
    )
    hist = fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=fs / nfft, statistics=stats,
        quantile_method='histogram', hist_bins=2048,
    )
    bin_w = (50.0 - -150.0) / 2048
    np.testing.assert_allclose(np.asarray(hist[0]), np.asarray(exact[0]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(hist[2]), np.asarray(exact[2]), atol=1e-3)
    # median within bin resolution of the exact order statistic
    assert np.abs(np.asarray(hist[1]) - np.asarray(exact[1])).max() <= 2 * bin_w


def test_psd_pallas_backend_matches_xla():
    """fft_backend='pallas' (fused kernel, interpret on CPU) with
    histogram quantiles."""
    fs = 1e6
    nfft = 1024
    x = jnp.asarray(make_tone_noise(nfft * 128, fs=fs))
    stats = ['mean', 'max']
    a = fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=fs / nfft, statistics=stats
    )
    b = fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=fs / nfft, statistics=stats,
        fft_backend='pallas',
    )
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-2)


def test_psd_fast_path_rejections():
    fs = 1e6
    x = make_tone_noise(512 * 8, fs=fs)
    # numpy input cannot take the device fast path
    with pytest.raises(ValueError, match='device'):
        fourier.power_spectral_density(
            x, fs=fs, window='hann', resolution=fs / 512,
            statistics=['0.5'], fft_backend='mxu',
        )
    # histogram method rejects unsupported named statistics
    with pytest.raises(ValueError, match='named statistics'):
        fourier.power_spectral_density(
            jnp.asarray(x), fs=fs, window='hann', resolution=fs / 512,
            statistics=['rms'], quantile_method='histogram',
        )


@pytest.mark.parametrize('bins_per_ch', [256, 192])
def test_channelize_power_pallas_backend(bins_per_ch):
    """fft_backend='pallas' (fused single-pass kernel, interpret on CPU)
    matches the XLA stft path, trims included (bench config #4 path)."""
    fs = 1e6
    nch, fpc = 8, 256
    nperseg = nch * fpc
    n = nperseg * 8
    x = jnp.asarray(make_tone_noise(n, fs=fs, f_tone=fs / 8, snr_db=40))

    f1, t1, p1 = fourier.channelize_power(
        x, 1 / fs, fpc, analysis_bins_per_channel=bins_per_ch,
        window='hann', channel_count=nch,
    )
    f2, t2, p2 = fourier.channelize_power(
        x, 1 / fs, fpc, analysis_bins_per_channel=bins_per_ch,
        window='hann', channel_count=nch, fft_backend='pallas',
    )
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p2), np.asarray(p1), rtol=1e-4,
        atol=1e-6 * float(np.asarray(p1).max()),
    )


def test_channelize_power_pallas_rejects_unsupported():
    x = jnp.asarray(make_tone_noise(2048 * 3))
    with pytest.raises(ValueError, match='pallas'):
        fourier.channelize_power(
            x, 1e-6, 256, analysis_bins_per_channel=256, window='hann',
            channel_count=8, fft_backend='pallas',
        )  # 3 frames: not a multiple of 8


def test_psd_refined_exact_quantiles_matches_sort():
    """on TPU targets, quantile_method='exact' at large frame counts
    replaces the full device sort with the bracketed two-pass
    refinement (round 4); values must agree with the sort path to
    float32 ulp (the refinement is bit-exact vs jnp.quantile of its
    own chunked spectrogram — tests/test_exact_quantiles.py — and the
    chunked-vs-one-shot transform differs at most at the last ulp)."""
    import iqwaveform_tpu.ops.spectral as sp

    rng = np.random.default_rng(2)
    n = 2048 * 256
    x = jnp.asarray(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            'complex64'
        )
    )
    kw = dict(
        fs=1e6, window='hann', resolution=1e6 / 256,
        statistics=['mean', 0.5, 0.99, 'max'], fft_backend='mxu',
    )

    orig = sp._refined_exact_applies
    orig_bytes = sp._REFINE_MIN_BYTES
    sp._refined_exact_applies = lambda named: True
    sp._REFINE_MIN_BYTES = 0  # force past the spectrogram-size gate
    try:
        refined = np.asarray(fourier.power_spectral_density(x, **kw))
    finally:
        sp._refined_exact_applies = orig
        sp._REFINE_MIN_BYTES = orig_bytes
    sp._refined_exact_applies = lambda named: False
    try:
        sorted_ = np.asarray(fourier.power_spectral_density(x, **kw))
    finally:
        sp._refined_exact_applies = orig
    np.testing.assert_allclose(refined, sorted_, atol=1e-5)


def test_psd_exact_quantiles_traceable_under_jit():
    """quantile_method='exact' under jax.jit must trace: the bracketed
    refinement (host-orchestrated) steps aside for the device-sort
    exact path, so reference-style jitted callers get the same exact
    order statistics instead of a TracerArrayConversionError (the
    round-4 psd matrix failure)."""
    import iqwaveform_tpu.ops.spectral as sp

    rng = np.random.default_rng(3)
    n = 2048 * 256
    x = jnp.asarray(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            'complex64'
        )
    )
    kw = dict(
        fs=1e6, window='hann', resolution=1e6 / 256,
        statistics=['mean', 0.5, 0.99, 'max'], fft_backend='mxu',
    )

    orig = sp._refined_exact_applies
    orig_bytes = sp._REFINE_MIN_BYTES
    sp._refined_exact_applies = lambda named: True
    sp._REFINE_MIN_BYTES = 0  # force past the spectrogram-size gate
    try:
        eager = np.asarray(fourier.power_spectral_density(x, **kw))
        jitted = np.asarray(
            jax.jit(
                lambda v: fourier.power_spectral_density(v, **kw)
            )(x)
        )
    finally:
        sp._refined_exact_applies = orig
        sp._REFINE_MIN_BYTES = orig_bytes
    np.testing.assert_allclose(jitted, eager, atol=1e-5)
