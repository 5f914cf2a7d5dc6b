"""Edge-case coverage: fractional windows, frequency shifts, domain
context validation, precision knobs."""

import jax.numpy as jnp
import numpy as np
import pytest

from iqwaveform_tpu import fourier, util

from conftest import make_tone_noise


def test_stft_nzero_fractional_window():
    """nzero zero-pads the window tail (reference fourier.py:121-133)."""
    fs = 1e6
    nperseg = 256
    nzero = 64
    x = make_tone_noise(nperseg * 16, fs=fs)

    Y = fourier.stft(
        x, fs=fs, window='hann', nperseg=nperseg, nzero=nzero,
        return_axis_arrays=False,
    )
    assert Y.shape == (16, nperseg)

    # equivalent: a hann window of nperseg-nzero, zero-padded
    w = fourier.get_window(
        'hann', nperseg - nzero, nzero=nzero, fftshift=True, dtype=None
    )
    assert np.all(w[nperseg - nzero :] == 0)


def test_psd_fractional_window():
    fs = 1e6
    x = make_tone_noise(1024 * 16, fs=fs)
    out = fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=fs / 1024,
        fractional_window=0.75, statistics=['mean'],
    )
    assert out.shape == (1, 1024)
    with pytest.raises(ValueError):
        fourier.power_spectral_density(
            x, fs=fs, window='hann', resolution=fs / 1024,
            fractional_window=0.7777, statistics=['mean'],
        )


def test_resample_with_shift():
    """integer frequency shift during downsampling recenters the band."""
    fs = 1e6
    n = 4096
    f_tone = 125e3
    x = make_tone_noise(n, fs=fs, f_tone=f_tone, snr_db=60)
    shift_bins = round(f_tone / (fs / n))
    y = np.asarray(fourier.resample(x, n // 4, shift=shift_bins))
    # the tone should now sit at baseband 0
    spec = np.abs(np.fft.fft(y))
    assert spec.argmax() == 0


def test_oaresample_frequency_shift():
    fs = 1e6
    nfft, nfft_out = 512, 256
    n = nfft * 32
    f_tone = 125e3
    x = make_tone_noise(n, fs=fs, f_tone=f_tone, snr_db=60)
    y = np.asarray(
        fourier.oaresample(
            x, nfft_out, nfft, fs, axis=0, frequency_shift=f_tone
        )
    )
    core = y[1024:-1024]
    spec = np.abs(np.fft.fft(core))
    peak_bin = spec.argmax()
    # shifted to baseband 0 at the new rate
    assert min(peak_bin, core.size - peak_bin) <= 1


def test_oaresample_shift_validation():
    x = make_tone_noise(512 * 8)
    with pytest.raises(ValueError):
        fourier.oaresample(x, 1024, 512, 1e6, axis=0, frequency_shift=1e5)
    with pytest.raises(ValueError):
        fourier.oaresample(x, 256, 512, 1e6, axis=0, frequency_shift=333.3)


def test_domain_validation():
    with pytest.raises(ValueError):
        util.get_input_domain(default='bogus')
    with pytest.raises(ValueError):
        with util.set_input_domain('not-a-domain'):
            pass


def test_upfirdn_precision_knob():
    import scipy.signal

    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000).astype('float32')
    h = scipy.signal.firwin(31, 0.4).astype('float32')
    expected = scipy.signal.upfirdn(h.astype('float64'), x.astype('float64'), 2, 3)

    import jax

    hi = fourier.upfirdn(h, jnp.asarray(x), 2, 3, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(hi), expected, atol=1e-5)

    lo = fourier.upfirdn(h, jnp.asarray(x), 2, 3, precision=jax.lax.Precision.DEFAULT)
    # still correct to reduced precision
    np.testing.assert_allclose(np.asarray(lo), expected, atol=1e-2)


def test_broadcast_onto_validation():
    with pytest.raises(ValueError):
        fourier.broadcast_onto(np.ones((2, 2)), np.ones((4, 4)), axis=0)


def test_time_fftshift_roundtrip_and_scale():
    x = make_tone_noise(512)
    y = fourier.time_fftshift(x.copy())
    z = fourier.time_ifftshift(y)
    np.testing.assert_allclose(z, x, atol=1e-6)

    y2 = np.asarray(fourier.time_fftshift(jnp.asarray(x), scale=2.0))
    np.testing.assert_allclose(np.abs(y2), 2 * np.abs(x), rtol=1e-5)


def test_get_max_fft_chunk_api():
    fourier.set_max_cupy_fft_chunk(12345)
    assert fourier.get_max_cupy_fft_chunk() == 12345
    fourier.set_max_cupy_fft_chunk(None)
    assert fourier.get_max_cupy_fft_chunk() is None


def test_max_fft_chunk_bounds_host_path():
    """the knob must actually chunk batched host FFTs (VERDICT r2 #9):
    results identical to the unchunked path, forward and inverse."""
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((16, 256)) + 1j * rng.standard_normal((16, 256))).astype(
        'complex64'
    )
    want_f = fourier.fft(x, axis=-1)
    want_i = fourier.ifft(x, axis=-1)
    want_0 = fourier.fft(x, axis=0)
    try:
        # 2 rows of 256 samples per chunk
        fourier.set_max_cupy_fft_chunk(512)
        np.testing.assert_allclose(fourier.fft(x, axis=-1), want_f, rtol=1e-6)
        np.testing.assert_allclose(fourier.ifft(x, axis=-1), want_i, rtol=1e-6)
        # 1-D transforms larger than the knob still run whole
        np.testing.assert_allclose(
            fourier.fft(x[0], axis=-1), want_f[0], rtol=1e-6
        )
        # axis=0 transform chunks along the other (batch) axis
        np.testing.assert_allclose(fourier.fft(x, axis=0), want_0, rtol=1e-6)
    finally:
        fourier.set_max_cupy_fft_chunk(None)


def test_pack_unpack_iq():
    from iqwaveform_tpu.utils import pack_iq_f32, unpack_iq
    import jax

    x = make_tone_noise(256)
    planes = pack_iq_f32(x)
    assert planes.shape == (2, 256) and planes.dtype == np.float32

    z = jax.jit(unpack_iq)(jnp.asarray(planes))
    np.testing.assert_allclose(np.asarray(z), x, atol=1e-6)


def test_channelize_power_with_overlap():
    fs = 1e6
    nch = 4
    fft_per_ch = 128
    x = make_tone_noise(fft_per_ch * nch * 32, fs=fs, f_tone=fs / 8, snr_db=40)
    freqs, times, power = fourier.channelize_power(
        x,
        1 / fs,
        fft_per_ch,
        analysis_bins_per_channel=fft_per_ch,
        window='hann',
        fft_overlap_per_channel=fft_per_ch // 2,
        channel_count=nch,
    )
    power = np.asarray(power)
    # overlap doubles (minus one) the number of time samples
    assert power.shape[0] == 2 * 32 - 1
    assert power.mean(axis=0).argmax() == 2
