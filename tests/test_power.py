"""power_analysis parity tests.

Includes the reference's tests/test_transforms.py ported as the seed
(reference test_transforms.py:7-17 — its third test `return`s instead of
asserting; asserted here), plus coverage the reference lacks.
"""

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from iqwaveform_tpu import (
    dBtopow,
    envtodB,
    envtopow,
    iq_to_bin_power,
    iq_to_cyclic_power,
    powtodB,
    sample_ccdf,
)
from iqwaveform_tpu import power_analysis, util

from conftest import make_tone_noise


# --- ported verbatim from reference tests/test_transforms.py (asserted) ---


def test_transform_int():
    assert powtodB(1) == 0


def test_transform_float():
    assert powtodB(1.0) == 0


def test_transform_series():
    s = pd.Series([1, 10, 100])
    expect = pd.Series([0, 10, 20])
    ret = powtodB(s)
    assert np.allclose(expect.values, ret.values)


# --- dB/power transforms ---


@pytest.mark.parametrize('xp', [np, jnp])
def test_powtodB_roundtrip(xp):
    x = xp.asarray(np.abs(np.random.default_rng(0).normal(size=256)) + 0.1)
    db = powtodB(x)
    back = dBtopow(db)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5)


@pytest.mark.parametrize('xp', [np, jnp])
def test_envtopow_complex(xp):
    x = make_tone_noise(512)
    v = envtopow(xp.asarray(x))
    np.testing.assert_allclose(np.asarray(v), np.abs(x) ** 2, rtol=1e-5)
    assert not np.iscomplexobj(np.asarray(v))


@pytest.mark.parametrize('xp', [np, jnp])
def test_envtodB(xp):
    x = make_tone_noise(512)
    v = envtodB(xp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(v), 20 * np.log10(np.abs(x)), rtol=1e-4, atol=1e-4
    )


def test_envtodB_eps_and_noabs():
    x = np.abs(make_tone_noise(64)).astype('float32')
    v = envtodB(x, abs=False, eps=1e-3)
    np.testing.assert_allclose(v, 20 * np.log10(x + 1e-3), rtol=1e-5)


def test_powtodB_series_units():
    s = pd.Series(np.ones(4))
    out = powtodB(s)
    assert isinstance(out, pd.Series)
    np.testing.assert_allclose(out.values, 0)


def test_dBlinmean():
    x = np.array([0.0, 10.0])  # 1 mW and 10 mW -> mean 5.5 mW
    v = power_analysis.dBlinmean(x)
    np.testing.assert_allclose(v, 10 * np.log10(5.5), rtol=1e-6)


def test_dBlinsum():
    x = np.array([0.0, 0.0])
    v = power_analysis.dBlinsum(x)
    np.testing.assert_allclose(v, 10 * np.log10(2.0), rtol=1e-6)


def test_unit_transforms():
    assert power_analysis.unit_linear_to_dB('mW') == 'dBm'
    assert power_analysis.unit_dB_to_linear('dBm') == 'mW'
    assert power_analysis.unit_wave_to_dB('√mW') == 'dBm'
    assert power_analysis.unit_wave_to_linear('√W') == 'W'


# --- detectors / binned power ---


def test_stat_ufunc_from_shorthand():
    f = power_analysis.stat_ufunc_from_shorthand('rms', xp=np, axis=0)
    x = np.arange(10.0)
    np.testing.assert_allclose(f(x), x.mean())
    q = power_analysis.stat_ufunc_from_shorthand(0.5, xp=np, axis=0)
    np.testing.assert_allclose(q(x), np.quantile(x, 0.5))
    with pytest.raises(ValueError):
        power_analysis.stat_ufunc_from_shorthand('bogus', xp=np)


@pytest.mark.parametrize('kind', ['mean', 'max', 'min', 'peak', 'rms', 'median', 0.9])
def test_iq_to_bin_power_detectors(kind):
    x = make_tone_noise(10000)
    Ts = 1e-6
    out = iq_to_bin_power(x, Ts, 100e-6, kind=kind)
    assert out.shape == (100,)
    assert out.dtype == np.float32

    pow_blocks = np.abs(x.reshape(100, 100).astype('complex128')) ** 2
    expected = power_analysis.stat_ufunc_from_shorthand(kind, xp=np, axis=1)(pow_blocks)
    np.testing.assert_allclose(out, expected, rtol=1e-4)

    outj = iq_to_bin_power(jnp.asarray(x), Ts, 100e-6, kind=kind)
    np.testing.assert_allclose(np.asarray(outj), expected, rtol=1e-3)


def test_iq_to_bin_power_validation():
    x = make_tone_noise(1000)
    with pytest.raises(ValueError):
        iq_to_bin_power(x, 1e-6, 101.5e-6)
    # truncate allows it
    out = iq_to_bin_power(x, 1e-6, 101e-6, truncate=True)
    assert out.shape == (9,)


def test_iq_to_bin_power_randomize():
    x = make_tone_noise(10000)
    out = iq_to_bin_power(x, 1e-6, 100e-6, randomize=True)
    assert out.shape == (100,)
    outj = iq_to_bin_power(jnp.asarray(x), 1e-6, 100e-6, randomize=True)
    assert np.asarray(outj).shape == (100,)


def test_iq_to_cyclic_power():
    x = make_tone_noise(100000)
    Ts = 1e-6
    ret = iq_to_cyclic_power(
        x, Ts, detector_period=100e-6, cyclic_period=10e-3, truncate=True
    )
    assert set(ret.keys()) == {'rms', 'peak'}
    assert set(ret['rms'].keys()) == {'min', 'mean', 'max'}
    assert ret['rms']['mean'].shape == (100,)
    # max >= mean >= min pointwise
    assert np.all(np.asarray(ret['rms']['max']) >= np.asarray(ret['rms']['min']))


def test_iq_to_cyclic_power_binned_domain():
    x = make_tone_noise(100000)
    Ts = 1e-6
    binned = {
        d: iq_to_bin_power(x, Ts, 100e-6, kind=d) for d in ('rms', 'peak')
    }
    with util.set_input_domain('time_binned_power'):
        ret = iq_to_cyclic_power(
            binned, Ts, detector_period=100e-6, cyclic_period=10e-3
        )
    direct = iq_to_cyclic_power(
        x, Ts, detector_period=100e-6, cyclic_period=10e-3
    )
    np.testing.assert_allclose(
        np.asarray(ret['rms']['mean']), np.asarray(direct['rms']['mean']), rtol=1e-6
    )


def test_iq_to_frame_power_deprecation():
    x = make_tone_noise(10000)
    with pytest.warns(UserWarning):
        ret = power_analysis.iq_to_frame_power(
            x, 1e-6, detector_period=100e-6, frame_period=1e-3
        )
    assert 'rms' in ret


# --- CCDF / histograms ---


def test_sample_ccdf():
    rng = np.random.default_rng(0)
    a = rng.exponential(size=100000).astype('float32')
    edges = np.linspace(0, 5, 50).astype('float32')
    ccdf = sample_ccdf(a, edges)
    expected = (a[:, None] > edges[None, :]).mean(axis=0)
    np.testing.assert_allclose(ccdf, expected, atol=1e-6)

    ccdf_j = sample_ccdf(jnp.asarray(a), jnp.asarray(edges))
    np.testing.assert_allclose(np.asarray(ccdf_j), expected, atol=1e-5)


def test_sample_ccdf_counts():
    a = np.array([0.5, 1.5, 2.5], dtype='float32')
    edges = np.array([1.0, 2.0], dtype='float32')
    ccdf = sample_ccdf(a, edges, density=False)
    np.testing.assert_array_equal(ccdf, [2, 1])


def test_power_histogram_along_axis():
    rng = np.random.default_rng(0)
    pvt = pd.DataFrame(
        rng.exponential(size=(32, 16)) + 1e-3,
        index=np.arange(32) * 0.1,
    )
    df = power_analysis.power_histogram_along_axis(
        pvt.T, bounds=(-30, 10), resolution_db=1, resolution_axis=4, axis=0
    )
    assert df.shape[0] == 8
    # n_bins = 1 + span/resolution (reference power_analysis.py:638)
    assert df.shape[1] == 41
    # total counts conserved (all samples in range)
    assert df.values.sum() <= 32 * 16


def test_unstack_series_to_bins():
    s = pd.Series(np.arange(100.0), index=np.arange(100) * 0.01)
    df = power_analysis.unstack_series_to_bins(s, 0.1)
    assert df.shape == (10, 10)
