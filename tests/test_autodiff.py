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


# ---- kernel-enabled designs (VERDICT r3 #5) ----
#
# The Pallas kernels define no JVP/VJP rules; every kernel dispatch
# point wraps its call in ops.pallas._common.grad_fallback, so under
# differentiation BOTH the primal and the tangent come from the XLA
# twin. These tests pin that contract: gradients (and grad-mode values)
# of a kernel-enabled design equal those of the equivalent XLA design.


def _flagship_small(**kws):
    from iqwaveform_tpu.models import design_wideband_monitor

    base = dict(
        channel_count=16, fft_size_per_channel=256, window='hamming',
        apd_bins=128, apd_navg=16, fft_backend='mxu', min_fft_size=8191,
    )
    base.update(kws)
    return design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, **base
    )


def test_grad_monitor_packed_kernel_design():
    """grad through the fully-packed monitor (all pallas kernels armed)
    must equal grad through the plain mxu/xla design: both linearize
    the same XLA twin."""
    from iqwaveform_tpu.models import WidebandMonitor

    d_pallas = _flagship_small(
        ola_kernel='pallas', apd_kernel='pallas', chan_kernel='pallas',
        fft_precision='high',
    )
    d_xla = _flagship_small(
        ola_kernel='matmul', apd_kernel='sort', chan_kernel='xla',
        fft_precision='highest',
    )
    m_p = WidebandMonitor(d_pallas)
    m_x = WidebandMonitor(d_xla)
    n = m_p.min_input_multiple() * 4
    assert m_p._packed_applies(n)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            'complex64'
        )
    )

    def loss(mon):
        return lambda v: mon.step(v)['psd_mean'].sum()

    v_p, g_p = jax.value_and_grad(loss(m_p))(x)
    v_x, g_x = jax.value_and_grad(loss(m_x))(x)
    # under differentiation the packed design's forward VALUE is the
    # twin's (full-f32 XLA), so value and grad both match the xla design
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=2e-6)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-6
    )


def test_grad_monitor_unpacked_pallas_ola():
    """the non-packed body with only the fused OLA kernel armed: grad
    dispatches that site to the mxu einsum twin."""
    from iqwaveform_tpu.models import WidebandMonitor

    d_pallas = _flagship_small(ola_kernel='pallas', fft_precision='high')
    d_xla = _flagship_small(ola_kernel='matmul', fft_precision='highest')
    m_p = WidebandMonitor(d_pallas)
    m_x = WidebandMonitor(d_xla)
    assert m_p._fused_ola_raw is not None
    # an input length the packed path does NOT cover (odd hop count)
    n = m_p.min_input_multiple() * 3
    if m_p._packed_applies(n):
        n = m_p.min_input_multiple()
        assert not m_p._packed_applies(n)

    rng = np.random.default_rng(1)
    x = jnp.asarray(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            'complex64'
        )
    )
    g_p = jax.grad(lambda v: m_p.step(v)['psd_mean'].sum())(x)
    g_x = jax.grad(lambda v: m_x.step(v)['psd_mean'].sum())(x)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-6
    )


def test_grad_monitor_accumulate_step_kernel_design():
    """the streaming accumulate/flush path with the channelizer kernel
    armed differentiates via the XLA twin of _chan_apd."""
    from iqwaveform_tpu.models import WidebandMonitor

    d = _flagship_small(
        ola_kernel='pallas', apd_kernel='pallas', chan_kernel='pallas',
        fft_precision='high',
    )
    mon = WidebandMonitor(d)
    chunk = mon.min_input_multiple() * 4

    rng = np.random.default_rng(2)
    x = jnp.asarray(
        (rng.standard_normal(chunk) + 1j * rng.standard_normal(chunk))
        .astype('complex64')
    )

    def loss(v):
        carry = mon.init_carry(chunk)
        carry = mon.accumulate_step(carry, v)
        out = mon.flush(carry)
        return out['psd_mean'].sum()

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(jnp.abs(g))).all()
    assert float(jnp.abs(g).sum()) > 0


def test_grad_psd_pallas_backend(iq):
    """fft_backend='pallas' PSD differentiates via the factored mxu
    twin; gradients match the explicit mxu backend."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        (rng.standard_normal(2**17) + 1j * rng.standard_normal(2**17))
        .astype('complex64')
    )
    kw = dict(
        fs=1e6, window='hann', resolution=1e6 / 1024,
        statistics=['mean', 'max'],
    )

    def loss(backend):
        return lambda v: fourier.power_spectral_density(
            v, fft_backend=backend, **kw
        ).sum()

    g_p = jax.grad(loss('pallas'))(x)
    g_m = jax.grad(loss('mxu'))(x)
    np.testing.assert_allclose(
        np.asarray(jnp.abs(g_p)), np.asarray(jnp.abs(g_m)),
        rtol=1e-4, atol=1e-7,
    )


def test_grad_streaming_persistence_pallas_backend():
    from iqwaveform_tpu.parallel.streaming import (
        streaming_persistence_spectrum,
    )

    rng = np.random.default_rng(4)
    n = 2 * 131072
    x = jnp.asarray(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            'complex64'
        )
    )

    def loss(backend):
        def f(v):
            out = streaming_persistence_spectrum(
                v, fs=1e6, window='hann', nfft=1024, chunk_frames=128,
                hist_bins=128, fft_backend=backend,
                fft_precision='highest',
            )
            return out['mean_dB'].sum()

        return f

    g_p = jax.grad(loss('pallas'))(x)
    g_m = jax.grad(loss('mxu'))(x)
    np.testing.assert_allclose(
        np.asarray(jnp.abs(g_p)), np.asarray(jnp.abs(g_m)),
        rtol=1e-4, atol=1e-7,
    )


def test_grad_upfirdn_pallas_backend(iq):
    h = jnp.asarray(
        fourier.design_fir_lpf(4e5, 1e6, numtaps=31, transition_bandwidth=1e5)
    )

    def loss(backend):
        return lambda v: (
            jnp.abs(fourier.upfirdn(h, v, up=2, down=3, backend=backend)) ** 2
        ).sum()

    g_p = jax.grad(loss('pallas'))(iq)
    g_x = jax.grad(loss('xla'))(iq)
    np.testing.assert_allclose(
        np.asarray(jnp.abs(g_p)), np.asarray(jnp.abs(g_x)),
        rtol=1e-4, atol=1e-6,
    )


def test_grad_corr_pallas_backend():
    rng = np.random.default_rng(5)
    phy = ofdm.Phy3GPP(10e6)
    inds = np.asarray(phy.index_cyclic_prefix())[:, :8].copy()
    # contiguous rows (the pallas backend's structured requirement)
    wave = jnp.asarray(
        (
            rng.standard_normal(2 * phy.contiguous_size)
            + 1j * rng.standard_normal(2 * phy.contiguous_size)
        ).astype('complex64')
    )

    def loss(backend):
        return lambda v: (
            jnp.abs(
                ofdm.corr_at_indices(inds, v, phy.nfft, backend=backend)
            )
            ** 2
        ).sum()

    g_p = jax.grad(loss('pallas'))(wave)
    g_x = jax.grad(loss('xla'))(wave)
    np.testing.assert_allclose(
        np.asarray(jnp.abs(g_p)), np.asarray(jnp.abs(g_x)),
        rtol=1e-4, atol=1e-6,
    )


def test_grad_channelize_pallas_backend():
    from iqwaveform_tpu.ops.spectral import channelize_power

    rng = np.random.default_rng(6)
    n = 8 * 1024
    x = jnp.asarray(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            'complex64'
        )
    )

    def loss(backend):
        def f(v):
            *_, cp = channelize_power(
                v, 1e-6, 256, analysis_bins_per_channel=192,
                window='hamming', channel_count=4, fft_backend=backend,
            )
            return cp.sum()

        return f

    g_p = jax.grad(loss('pallas'))(x)
    g_m = jax.grad(loss('mxu'))(x)
    np.testing.assert_allclose(
        np.asarray(jnp.abs(g_p)), np.asarray(jnp.abs(g_m)),
        rtol=1e-4, atol=1e-7,
    )


def test_grad_ola_filter_fused_backends(iq):
    """grad semantics at the public fused-OLA dispatch point (VERDICT r3
    #5 contract extended to the r4 #4 public route): differentiating
    through fft_backend='pallas' dispatches the XLA twin, so gradients
    match the 'mxu' einsum path."""
    kw = dict(
        fs=1e6, nfft=512, window='hamming', passband=(-2e5, 2e5),
        nfft_out=256, fft_precision='highest',
    )

    def loss(backend):
        return lambda z: (
            jnp.abs(fourier.ola_filter(z, fft_backend=backend, **kw)) ** 2
        ).sum()

    check_grads(
        loss('pallas'), (iq,), order=1, modes=['rev'], atol=ATOL, rtol=RTOL
    )
    g_pl = jax.grad(lambda z: loss('pallas')(jnp.asarray(z)))(iq)
    g_mx = jax.grad(lambda z: loss('mxu')(jnp.asarray(z)))(iq)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_mx), atol=1e-4, rtol=1e-4
    )
