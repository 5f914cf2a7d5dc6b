"""Window synthesis tests.

Oracles: scipy.signal.get_window, scipy.ndimage.fourier_shift (the
reference's fftshift-baking mechanism, fourier.py:139-146).
"""

import numpy as np
import pytest
import scipy.ndimage
import scipy.signal

from iqwaveform_tpu import fourier, windows


@pytest.mark.parametrize('n', [8, 9, 64, 127])
def test_fftshift_bake_matches_scipy_fourier_shift(n):
    w = fourier.get_window('hamming', n, fftshift=True, norm=False, dtype=None)
    ws = scipy.signal.get_window('hamming', n)
    delay = scipy.ndimage.fourier_shift(np.ones_like(ws), n // 2)
    if n % 2 == 0:
        delay = delay.real
    expected = delay * ws
    np.testing.assert_allclose(w, expected, atol=1e-12)


def test_get_window_matches_scipy():
    w = fourier.get_window('hann', 128, norm=False, dtype=None)
    np.testing.assert_allclose(w, scipy.signal.get_window('hann', 128), atol=1e-12)


def test_get_window_norm_unit_power():
    w = fourier.get_window('blackman', 256, norm=True, dtype=None)
    np.testing.assert_allclose(np.mean(np.abs(w) ** 2), 1.0, rtol=1e-10)


def test_get_window_zero_padding():
    w = fourier.get_window('hann', 100, nzero=28, norm=False, dtype=None)
    assert w.shape == (128,)
    assert np.all(w[100:] == 0)

    wc = fourier.get_window(
        'hann', 100, nzero=28, center_zeros=True, norm=False, dtype=None
    )
    assert np.all(wc[:14] == 0) and np.all(wc[114:] == 0)


def test_get_window_dtype():
    assert fourier.get_window('hann', 64).dtype == np.float32
    assert fourier.get_window('hann', 64, fftshift=True).dtype == np.float32
    # odd size with fftshift is complex
    assert np.iscomplexobj(fourier.get_window('hann', 63, fftshift=True))


def test_get_window_jax_output():
    import jax.numpy as jnp

    w = fourier.get_window('hann', 64, xp=jnp)
    assert hasattr(w, 'device')


@pytest.mark.parametrize('name', ['knab', 'cosh', 'modified_bessel'])
def test_extra_windows_registered(name):
    w = fourier.get_window((name, 2.0), 128, norm=False, dtype=None)
    assert w.shape == (128,)
    assert np.all(np.isfinite(w))
    # unit-energy normalization built into these windows (windows.py:44 etc)
    sym = getattr(windows, name)(128, 2.0, sym=True)
    np.testing.assert_allclose(np.sum(sym**2), 1.0, rtol=1e-10)


def test_acg_window():
    w = windows.acg(128, 0.1)
    assert w.shape == (128,)
    assert w.max() <= 1.0 + 1e-12
    # approximately symmetric
    np.testing.assert_allclose(w, w[::-1], rtol=1e-6)


def test_window_length_guards():
    assert windows.knab(0, 1.0).shape == (0,)
    assert windows.cosh(1, 1.0).shape == (1,)
    with pytest.raises(ValueError):
        windows.knab(-2, 1.0)


def test_enbw_known_values():
    # hann ENBW = 1.5 bins, hamming ~ 1.3628 (classic values, large N)
    enbw_hann = float(fourier.equivalent_noise_bandwidth('hann', 4096))
    assert abs(enbw_hann - 1.5) < 1e-2
    enbw_hamming = float(fourier.equivalent_noise_bandwidth('hamming', 4096))
    assert abs(enbw_hamming - 1.3628) < 1e-2


@pytest.mark.parametrize('name', ['kaiser', 'dpss'])
def test_find_window_param_from_enbw_roundtrip(name):
    target = 1.8
    param = fourier.find_window_param_from_enbw(name, target, nfft=512)
    achieved = float(
        fourier.equivalent_noise_bandwidth((name, param), 512)
    )
    assert abs(achieved - target) < 1e-3


def test_find_window_param_validates():
    with pytest.raises(ValueError):
        fourier.find_window_param_from_enbw('kaiser', 0.5)
    with pytest.raises(ValueError):
        fourier.find_window_param_from_enbw('hann', 1.5)


def test_enbw_window_solver_via_get_window():
    # the ('name_by_enbw', enbw) spelling solves the parameter inline
    w = fourier.get_window(('kaiser_by_enbw', 2.0), 256, norm=False, dtype=None)
    assert w.shape == (256,)


@pytest.mark.parametrize('name', ['kaiser', 'dpss', 'chebwin'])
def test_enbw_inversion_sweep(name):
    """hand-rolled property sweep: the ENBW->parameter bisection solve
    roundtrips across the practical ENBW range and several FFT sizes
    (ROADMAP quality item). chebwin bottoms out at ~1.33 bins (scipy
    floors the attenuation at 45 dB), so its sweep starts at 1.4."""
    targets = (1.4, 1.5, 2.0, 3.0, 4.5) if name == 'chebwin' else (
        1.2, 1.5, 2.0, 3.0, 4.5
    )
    for nfft in (256, 1024, 4096):
        for target in targets:
            param = fourier.find_window_param_from_enbw(
                name, target, nfft=nfft
            )
            realized = float(
                fourier.equivalent_noise_bandwidth((name, param), nfft)
            )
            assert abs(realized - target) < 1e-4, (name, nfft, target, realized)
