"""upfirdn / oaconvolve parity tests.

Oracle: scipy.signal.upfirdn (cited by the reference GPU kernel docstring,
cuda.py:490) and scipy.signal.oaconvolve.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from iqwaveform_tpu import fourier
from iqwaveform_tpu.ops.resample_poly import upfirdn_output_len

from conftest import make_tone_noise


@pytest.mark.parametrize('up,down', [(1, 1), (3, 1), (1, 4), (2, 3), (7, 5), (160, 147)])
@pytest.mark.parametrize('dtype', ['float32', 'complex64'])
def test_upfirdn_matches_scipy(up, down, dtype):
    rng = np.random.default_rng(0)
    n = 1000
    if dtype == 'complex64':
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(dtype)
    else:
        x = rng.standard_normal(n).astype(dtype)
    h = scipy.signal.firwin(64, 0.4).astype('float32')

    expected = scipy.signal.upfirdn(
        h.astype('float64'), x.astype('complex128' if 'complex' in dtype else 'float64'),
        up=up, down=down,
    )

    ours_np = fourier.upfirdn(h, x, up=up, down=down)
    np.testing.assert_allclose(ours_np, expected, atol=1e-5)

    ours_j = fourier.upfirdn(h, jnp.asarray(x), up=up, down=down)
    assert ours_j.shape[-1] == upfirdn_output_len(len(h), n, up, down)
    np.testing.assert_allclose(np.asarray(ours_j), expected, atol=1e-4)


def test_upfirdn_complex_taps():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(500) + 1j * rng.standard_normal(500)).astype('complex64')
    h = (rng.standard_normal(32) + 1j * rng.standard_normal(32)).astype('complex64')
    expected = scipy.signal.upfirdn(h.astype('complex128'), x.astype('complex128'), up=2, down=3)
    ours = fourier.upfirdn(h, jnp.asarray(x), up=2, down=3)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-4)


def test_upfirdn_axis_batched():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 300)).astype('float32')
    h = scipy.signal.firwin(17, 0.3).astype('float32')
    expected = scipy.signal.upfirdn(h.astype('float64'), x.astype('float64'), up=2, down=5, axis=1)
    ours = fourier.upfirdn(h, jnp.asarray(x), up=2, down=5, axis=1)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)

    # axis=0
    expected0 = scipy.signal.upfirdn(h.astype('float64'), x.T.astype('float64'), up=2, down=5, axis=0)
    ours0 = fourier.upfirdn(h, jnp.asarray(x.T), up=2, down=5, axis=0)
    np.testing.assert_allclose(np.asarray(ours0), expected0, atol=1e-5)


def test_upfirdn_validates():
    x = np.zeros(10, 'float32')
    with pytest.raises(NotImplementedError):
        fourier.upfirdn(np.ones(3, 'float32'), x, mode='wrap')
    with pytest.raises(ValueError):
        fourier.upfirdn(np.ones((3, 3), 'float32'), x)
    with pytest.raises(ValueError):
        fourier.upfirdn(np.ones(3, 'float32'), x, up=0)


def test_upfirdn_polyphase_resampling_tone():
    """end-to-end fractional resample with an anti-aliasing filter."""
    fs = 1e6
    up, down = 2, 3
    f_tone = 50e3
    x = make_tone_noise(3000, fs=fs, f_tone=f_tone, snr_db=60)
    h = (up * scipy.signal.firwin(101, 0.9 / max(up, down))).astype('float32')
    y = np.asarray(fourier.upfirdn(h, jnp.asarray(x), up=up, down=down))
    core = y[100:-100]
    spec = np.abs(np.fft.fft(core))
    peak = np.fft.fftfreq(core.size, down / (fs * up))[spec.argmax()]
    np.testing.assert_allclose(peak, f_tone, atol=2 * fs / 3000)


@pytest.mark.parametrize('mode', ['full', 'same'])
def test_oaconvolve_matches_scipy(mode):
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(500) + 1j * rng.standard_normal(500)).astype('complex64')
    h = rng.standard_normal(64).astype('float32')
    expected = scipy.signal.oaconvolve(x, h.astype(x.dtype), mode=mode)
    ours_np = fourier.oaconvolve(x, h.astype(x.dtype), mode=mode)
    np.testing.assert_allclose(ours_np, expected, atol=1e-4)
    ours_j = fourier.oaconvolve(jnp.asarray(x), jnp.asarray(h.astype(x.dtype)), mode=mode)
    np.testing.assert_allclose(np.asarray(ours_j), expected, atol=1e-3)


def test_upfirdn_parameter_sweep_vs_scipy():
    """hand-rolled property sweep (no hypothesis in the image): upfirdn
    across up/down/taps/length combinations against scipy (ROADMAP
    quality item)."""
    rng = np.random.default_rng(42)
    cases = [
        (up, down, nh, n)
        for up in (1, 2, 3, 5, 8)
        for down in (1, 2, 3, 7)
        for nh, n in (((4, 257)), ((31, 100)), ((64, 1023)))
    ]
    for up, down, nh, n in cases:
        x = rng.standard_normal(n).astype('float32')
        h = rng.standard_normal(nh).astype('float32')
        expected = scipy.signal.upfirdn(
            h.astype('float64'), x.astype('float64'), up=up, down=down
        )
        got = np.asarray(fourier.upfirdn(h, jnp.asarray(x), up=up, down=down))
        assert got.shape == expected.shape, (up, down, nh, n)
        scale = max(np.abs(expected).max(), 1e-6)
        np.testing.assert_allclose(
            got / scale, expected / scale, atol=2e-6,
            err_msg=f'up={up} down={down} nh={nh} n={n}',
        )
