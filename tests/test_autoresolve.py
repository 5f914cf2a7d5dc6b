"""Auto kernel/backend resolution (VERDICT r3 #1).

The reference auto-picks its fastest backend (upfirdn CUDA dispatch,
fourier.py:1476-1495; numexpr fast paths, power_analysis.py:183-196).
Here the same policy is explicit: 'auto' defaults resolve per
platform/shape to the fastest supported implementation, so the benched
configuration IS the out-of-box configuration on TPU, while CPU (and any
unsupported shape) falls back to the plain XLA paths.

These tests pin the resolution decisions themselves (pure host logic,
exercised with forced tpu=True/False); numerical equivalence of the
kernel paths is pinned by test_monitor/test_pallas/test_spectral.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iqwaveform_tpu.models import (
    WidebandMonitor,
    design_wideband_monitor,
    resolve_monitor_design,
)


def _flagship_design(**kws):
    base = dict(
        channel_count=16, fft_size_per_channel=256, window='hamming',
        apd_bins=2048, apd_navg=16, min_fft_size=8191,
    )
    base.update(kws)
    return design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, **base
    )


def test_monitor_design_defaults_are_auto():
    d = _flagship_design()
    assert d.fft_backend == 'auto'
    assert d.fft_precision == 'auto'
    assert d.ola_kernel == 'auto'
    assert d.apd_kernel == 'auto'
    assert d.chan_kernel == 'auto'


def test_monitor_resolution_tpu_is_the_benched_config():
    """on a TPU target the default flagship design must resolve to
    exactly the tuned configuration bench.py's monitor8192p measures —
    the VERDICT r3 #1 'fast paths are the defaults' contract."""
    r = resolve_monitor_design(_flagship_design(), tpu=True)
    assert r.fft_backend == 'mxu'
    assert r.fft_precision == 'high'
    assert r.ola_kernel == 'pallas'
    assert r.chan_kernel == 'pallas'
    # apd stays 'auto': resolved per program from the trace-time binned
    # sample count ('pallas' below ~2M samples, 'packed' above)
    assert r.apd_kernel == 'auto'


def test_monitor_resolution_cpu_is_plain_xla():
    r = resolve_monitor_design(_flagship_design(), tpu=False)
    assert r.fft_backend == 'xla'
    assert r.fft_precision == 'highest'
    assert r.ola_kernel == 'matmul'
    assert r.apd_kernel == 'sort'
    assert r.chan_kernel == 'xla'


def test_monitor_resolution_idempotent_and_passthrough():
    d = _flagship_design()
    rt = resolve_monitor_design(d, tpu=True)
    rc = resolve_monitor_design(d, tpu=False)
    # a fully-resolved design passes through unchanged (same object)
    assert resolve_monitor_design(rt, tpu=True) is rt
    assert resolve_monitor_design(rc, tpu=False) is rc
    # explicit fields are never overridden
    d2 = dataclasses.replace(d, ola_kernel='matmul', fft_precision='highest')
    r2 = resolve_monitor_design(d2, tpu=True)
    assert r2.ola_kernel == 'matmul'
    assert r2.fft_precision == 'highest'
    assert r2.fft_backend == 'mxu'  # still resolved


def test_monitor_resolution_unsupported_chan_layout_falls_back():
    # 6-bin channels put multiple boundaries inside one factored lane
    # (chan_stats_supported rejects); 'auto' must fall back to xla, not
    # raise like an explicit chan_kernel='pallas' request would
    d = _flagship_design(
        channel_count=128, fft_size_per_channel=16,
        analysis_bins_per_channel=6,
    )
    r = resolve_monitor_design(d, tpu=True)
    assert r.chan_kernel == 'xla'
    assert r.ola_kernel == 'pallas'  # the OLA stage is unaffected


def test_monitor_init_resolves_and_keeps_request():
    d = _flagship_design()
    mon = WidebandMonitor(d)  # CPU under tests
    assert mon.requested_design is d
    assert mon.design.fft_backend == 'xla'
    assert mon.design.ola_kernel == 'matmul'
    # a tpu-resolved design still constructs on CPU (kernels interpret)
    mon_t = WidebandMonitor(resolve_monitor_design(d, tpu=True))
    assert mon_t._fused_ola_raw is not None
    assert mon_t._chan_stats is not None


def test_psd_backend_resolution():
    from iqwaveform_tpu.ops.spectral import _resolve_psd_backend

    kw = dict(noverlap=0, fractional_window=1, dB=True, axis=0)
    x = jnp.zeros((2**17,), jnp.complex64)
    # slab-aligned device input on TPU -> the fused kernel
    assert _resolve_psd_backend(x, nfft=1024, tpu=True, **kw) == 'pallas'
    # composite but not slab-aligned -> factored mxu
    assert (
        _resolve_psd_backend(x[: 3 * 4096], nfft=4096, tpu=True, **kw)
        == 'mxu'
    )
    # CPU, numpy input, overlap, or linear output -> xla
    assert _resolve_psd_backend(x, nfft=1024, tpu=False, **kw) == 'xla'
    assert (
        _resolve_psd_backend(np.zeros(2**17, 'complex64'), nfft=1024,
                             tpu=True, **kw)
        == 'xla'
    )
    assert (
        _resolve_psd_backend(
            x, nfft=1024, noverlap=512, fractional_window=1, dB=True,
            axis=0, tpu=True,
        )
        == 'xla'
    )
    assert (
        _resolve_psd_backend(
            x, nfft=1024, noverlap=0, fractional_window=1, dB=False,
            axis=0, tpu=True,
        )
        == 'xla'
    )
    # prime nfft > 128 has no four-step plan
    assert _resolve_psd_backend(x, nfft=131, tpu=True, **kw) == 'xla'


def test_psd_default_backend_matches_xla_on_cpu():
    """with 'auto' resolving to 'xla' here, the default call must be
    bit-identical to an explicit fft_backend='xla' call."""
    from iqwaveform_tpu.ops.spectral import power_spectral_density

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.standard_normal(2**14) + 1j * rng.standard_normal(2**14)).astype(
            'complex64'
        )
    )
    kw = dict(
        fs=1e6, window='hann', resolution=1e6 / 512,
        statistics=['mean', 'max', 0.5],
    )
    a = power_spectral_density(x, **kw)
    b = power_spectral_density(x, fft_backend='xla', **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_channelize_backend_resolution():
    from iqwaveform_tpu.ops.spectral import _resolve_channelize_backend

    x = jnp.zeros((2**17,), jnp.complex64)
    kw = dict(
        fft_size_per_channel=256, channel_count=4,
        analysis_bins_per_channel=192, fft_overlap_per_channel=0,
        window_is_spec=True,
    )
    assert _resolve_channelize_backend(x, tpu=True, **kw) == 'pallas'
    assert _resolve_channelize_backend(x, tpu=False, **kw) == 'xla'
    # frame count not a multiple of 8 -> factored mxu path
    assert (
        _resolve_channelize_backend(x[: 3 * 1024], tpu=True, **kw) == 'mxu'
    )
    # array window (not a spec) -> xla
    assert (
        _resolve_channelize_backend(
            x, tpu=True, **{**kw, 'window_is_spec': False}
        )
        == 'xla'
    )
    # overlap -> xla
    assert (
        _resolve_channelize_backend(
            x, tpu=True, **{**kw, 'fft_overlap_per_channel': 64}
        )
        == 'xla'
    )


def test_persistence_backend_resolution():
    from iqwaveform_tpu.parallel.streaming import (
        _resolve_persistence_backend,
        design_persistence,
    )

    assert _resolve_persistence_backend(1024, tpu=True) == 'pallas'
    assert _resolve_persistence_backend(1024, tpu=False) == 'xla'
    # chunk not a slab multiple demotes pallas to mxu
    assert (
        _resolve_persistence_backend(1024, tpu=True, chunk_samples=4096)
        == 'mxu'
    )
    # nfft the kernel cannot tile, composite -> mxu; prime > 128 -> xla
    assert _resolve_persistence_backend(1000, tpu=True) == 'mxu'
    assert _resolve_persistence_backend(131 * 1, tpu=True) == 'xla'

    # design-level defaults on CPU stay the exact xla/f32 path
    d = design_persistence(nfft=1024, window='hann')
    assert d['fft_backend'] == 'xla'
    assert d['fingerprint'][4] == 'highest'


def test_streaming_persistence_auto_matches_xla_on_cpu():
    from iqwaveform_tpu.parallel.streaming import (
        streaming_persistence_spectrum,
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(
        (rng.standard_normal(4096 * 8) + 1j * rng.standard_normal(4096 * 8))
        .astype('complex64')
    )
    a = streaming_persistence_spectrum(
        x, fs=1e6, window='hann', nfft=512, chunk_frames=16, hist_bins=128
    )
    b = streaming_persistence_spectrum(
        x, fs=1e6, window='hann', nfft=512, chunk_frames=16, hist_bins=128,
        fft_backend='xla', fft_precision='highest',
    )
    np.testing.assert_array_equal(np.asarray(a['hist']), np.asarray(b['hist']))
    np.testing.assert_array_equal(
        np.asarray(a['mean_dB']), np.asarray(b['mean_dB'])
    )
