"""Bluestein arbitrary-size FFT (ops/czt.py) tests.

Oracle: numpy.fft at float64. The module exists because XLA:TPU lowers
non-pow2 FFTs as a dense n x n DFT matmul (HBM-infeasible at capture
sizes — the round-5 clock-sync failure); on the CPU test mesh the
routing predicate is false, so these tests call the transform directly
and force the routing with monkeypatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import iqwaveform_tpu.ops.fft as fft_mod
from iqwaveform_tpu import fourier
from iqwaveform_tpu.ops.czt import _bluestein_design, fft_bluestein, ifft_bluestein


def _noise(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        'complex64'
    )


# prime, 2^a*3^b*prime (the clock-sync failure class), odd composite,
# even non-pow2, pow2 (degenerate), tiny
@pytest.mark.parametrize('n', [1511, 2 * 27 * 151, 3**5, 1000, 256, 2, 7])
def test_fft_bluestein_matches_numpy(n):
    x = _noise(n)
    got = np.asarray(jax.jit(fft_bluestein)(jnp.asarray(x)))
    exp = np.fft.fft(x.astype('complex128'))
    scale = max(1.0, float(np.abs(exp).max()))
    np.testing.assert_allclose(got, exp, atol=2e-4 * scale)


@pytest.mark.parametrize('n', [1511, 1000, 7])
def test_ifft_bluestein_matches_numpy(n):
    x = _noise(n, seed=1)
    got = np.asarray(jax.jit(ifft_bluestein)(jnp.asarray(x)))
    exp = np.fft.ifft(x.astype('complex128'))
    np.testing.assert_allclose(got, exp, atol=2e-5)


def test_fft_bluestein_batched_axis():
    x = _noise(6 * 270, seed=2).reshape(6, 270)
    got = np.asarray(jax.jit(lambda v: fft_bluestein(v, axis=1))(jnp.asarray(x)))
    exp = np.fft.fft(x.astype('complex128'), axis=1)
    np.testing.assert_allclose(got, exp, atol=2e-4 * float(np.abs(exp).max()))
    got0 = np.asarray(
        jax.jit(lambda v: fft_bluestein(v, axis=0))(jnp.asarray(x.T.copy()))
    )
    np.testing.assert_allclose(got0, exp.T, atol=2e-4 * float(np.abs(exp).max()))


def test_bluestein_design_pads_to_pow2():
    for n in (2, 3, 1000, 1511):
        a, b_hat, M = _bluestein_design(n)
        assert M >= 2 * n - 1 and (M & (M - 1)) == 0
        assert a.shape == (n,) and b_hat.shape == (M,)
        assert a.dtype == np.complex64


def test_needs_bluestein_predicate():
    # pow2 and trivial sizes never route; non-pow2 routes iff tpu
    assert not fft_mod._tpu_needs_bluestein(4096, tpu=True)
    assert not fft_mod._tpu_needs_bluestein(1, tpu=True)
    assert fft_mod._tpu_needs_bluestein(326376, tpu=True)
    assert not fft_mod._tpu_needs_bluestein(326376, tpu=False)


def test_resample_routes_bluestein_when_forced(monkeypatch):
    """the full fourier.resample device path with the TPU routing forced
    on: exercises fft+ifft Bluestein at the clock-sync size class and
    must match the host (scipy-semantics) resample."""
    n, num = 32640, 32616  # 2^7*3*5*17 -> 2^3*3*1359; both non-pow2
    x = _noise(n, seed=3)
    host = np.asarray(fourier.resample(x, num))
    monkeypatch.setattr(
        fft_mod, '_tpu_needs_bluestein',
        lambda size, tpu=None: size > 1 and (size & (size - 1)) != 0,
    )
    dev = np.asarray(
        jax.jit(lambda v: fourier.resample(v, num))(jnp.asarray(x))
    )
    np.testing.assert_allclose(dev, host, atol=5e-4 * float(np.abs(host).max()))


def test_subsample_shift_routes_bluestein_when_forced(monkeypatch):
    from iqwaveform_tpu import ofdm

    n = 3 * 1511
    x = _noise(n, seed=4)
    host = np.asarray(ofdm.subsample_shift(x, 0.3))
    monkeypatch.setattr(
        fft_mod, '_tpu_needs_bluestein',
        lambda size, tpu=None: size > 1 and (size & (size - 1)) != 0,
    )
    dev = np.asarray(
        jax.jit(lambda v: ofdm.subsample_shift(v, 0.3))(jnp.asarray(x))
    )
    np.testing.assert_allclose(dev, host, atol=2e-4 * float(np.abs(host).max()))
