"""Differentiability of the transform stack (a TPU-native extra).

The reference (cupy/numba) has no autodiff; here every jax-path
transform is built from traceable primitives, so jax.grad works through
the DSP pipeline — including with respect to filter taps, enabling
gradient-based filter design. These tests pin that property with
numeric gradient checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from iqwaveform_tpu import fourier, ofdm, power_analysis

ATOL = RTOL = 2e-2


@pytest.fixture(scope='module')
def iq():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
    return jnp.asarray(x.astype('complex64'))


def test_grad_spectrogram_power(iq):
    def loss(z):
        spg = fourier.spectrogram(
            z,
            fs=1e6,
            window='hamming',
            nperseg=512,
            noverlap=256,
            return_axis_arrays=False,
        )
        return spg.sum()

    check_grads(loss, (iq,), order=1, modes=['rev'], atol=ATOL, rtol=RTOL)


def test_grad_resample(iq):
    def loss(z):
        return jnp.abs(fourier.resample(z, 2048)) ** 2

    check_grads(
        lambda z: loss(z).sum(), (iq,), order=1, modes=['rev'], atol=ATOL, rtol=RTOL
    )


def test_grad_ola_filter(iq):
    def loss(z):
        y = fourier.ola_filter(
            z, fs=1e6, nfft=512, window='hamming', passband=(-2e5, 2e5)
        )
        return (jnp.abs(y) ** 2).sum()

    check_grads(loss, (iq,), order=1, modes=['rev'], atol=ATOL, rtol=RTOL)


def test_grad_bin_power(iq):
    def loss(z):
        return power_analysis.iq_to_bin_power(
            z, Ts=1e-6, Tbin=64e-6, kind='mean'
        ).sum()

    check_grads(loss, (iq,), order=1, modes=['rev'], atol=ATOL, rtol=RTOL)


def test_grad_wrt_filter_taps(iq):
    """differentiating upfirdn with respect to the taps: the learned-
    filter-design use case (tracer taps must not be materialized)."""
    taps = jnp.asarray(
        fourier.design_fir_lpf(4e5, 1e6, numtaps=31, transition_bandwidth=1e5)
    )

    def loss(h):
        y = fourier.upfirdn(h, iq, up=2, down=3)
        return (jnp.abs(y) ** 2).sum()

    check_grads(loss, (taps,), order=1, modes=['rev'], atol=ATOL, rtol=RTOL)


def test_grad_corr_at_indices():
    rng = np.random.default_rng(1)
    phy = ofdm.Phy3GPP(10e6)
    inds = np.asarray(phy.index_cyclic_prefix())[:, :8].copy()
    wave = rng.standard_normal(2 * phy.contiguous_size) + 1j * rng.standard_normal(
        2 * phy.contiguous_size
    )
    wave = jnp.asarray(wave.astype('complex64'))

    def loss(z):
        return (jnp.abs(ofdm.corr_at_indices(inds, z, phy.nfft)) ** 2).sum()

    check_grads(loss, (wave,), order=1, modes=['rev'], atol=ATOL, rtol=RTOL)


def test_grad_psd_mean(iq):
    def loss(z):
        psd = fourier.power_spectral_density(
            z,
            fs=1e6,
            window='hamming',
            resolution=1e6 / 512,
            statistics=['mean'],
            dB=False,
        )
        return psd.sum()

    check_grads(loss, (iq,), order=1, modes=['rev'], atol=ATOL, rtol=RTOL)
