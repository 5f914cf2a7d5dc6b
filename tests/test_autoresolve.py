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


def test_fft_backend_resolution():
    """ops.fft.resolve_fft_backend: the plain-transform 'auto' contract
    (VERDICT r4 #4): mid-size composite jax transforms on TPU -> 'mxu',
    everything else quietly 'xla'."""
    from iqwaveform_tpu.ops.fft import MXU_AUTO_MAX_SIZE, resolve_fft_backend

    x = jnp.zeros((4, 1024), jnp.complex64)
    assert resolve_fft_backend(x, 1024, tpu=True) == 'mxu'
    assert resolve_fft_backend(x, 16384, tpu=True) == 'mxu'
    # CPU target, numpy input, prime size, or whole-capture size -> xla
    assert resolve_fft_backend(x, 1024, tpu=False) == 'xla'
    assert resolve_fft_backend(np.zeros(8), 1024, tpu=True) == 'xla'
    assert resolve_fft_backend(x, 131101, tpu=True) == 'xla'
    assert resolve_fft_backend(x, 2 * MXU_AUTO_MAX_SIZE, tpu=True) == 'xla'


def test_ola_backend_resolution():
    """ops.filtering._resolve_ola_backend: the fused factored OLA route
    on TPU targets when the design qualifies, quietly 'xla' otherwise."""
    from iqwaveform_tpu.ops.filtering import (
        _ola_bin_bounds,
        _resolve_ola_backend,
    )
    from iqwaveform_tpu.ops.window_design import equivalent_noise_bandwidth

    fs, nfft, nfft_out = 122.88e6, 16384, 8192
    enbw = equivalent_noise_bandwidth('hamming', nfft_out, fftbins=False)
    zl, zh, bi, bo = _ola_bin_bounds(
        nfft, nfft_out, fs, (-20e6, 20e6), enbw, True
    )
    x = jnp.zeros((8 * nfft,), jnp.complex64)
    kw = dict(nfft=nfft, nfft_out=nfft_out, axis=0, bounds_in=bi, bounds_out=bo)
    # the flagship monitor shape resolves to the Pallas kernel
    assert _resolve_ola_backend(x, noverlap_in=8192, tpu=True, **kw) == 'pallas'
    # CPU, numpy input, batched input, or no overlap -> xla
    assert _resolve_ola_backend(x, noverlap_in=8192, tpu=False, **kw) == 'xla'
    assert (
        _resolve_ola_backend(
            np.zeros(8 * nfft, 'complex64'), noverlap_in=8192, tpu=True, **kw
        )
        == 'xla'
    )
    assert (
        _resolve_ola_backend(
            jnp.zeros((2, 8 * nfft), jnp.complex64), noverlap_in=8192,
            tpu=True, **kw,
        )
        == 'xla'
    )
    assert _resolve_ola_backend(x, noverlap_in=0, tpu=True, **kw) == 'xla'
    # bounds the fused transform cannot align -> xla
    assert (
        _resolve_ola_backend(
            x, nfft=nfft, nfft_out=nfft_out, noverlap_in=8192, axis=0,
            bounds_in=(bi[0] + 1, bi[1] + 1), bounds_out=bo, tpu=True,
        )
        == 'xla'
    )


def test_stft_default_backend_matches_xla_on_cpu():
    """stft/spectrogram fft_backend defaults are 'auto'; on CPU that
    must be bit-identical to an explicit 'xla' call."""
    import inspect

    from iqwaveform_tpu.ops.stft import istft, spectrogram, stft

    for fn in (stft, istft, spectrogram):
        assert inspect.signature(fn).parameters['fft_backend'].default == 'auto'

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(
            'complex64'
        )
    )
    kw = dict(fs=1e6, window='hann', nperseg=256, noverlap=128,
              return_axis_arrays=False)
    np.testing.assert_array_equal(
        np.asarray(stft(x, **kw)), np.asarray(stft(x, fft_backend='xla', **kw))
    )


def test_ola_filter_default_backend_matches_xla_on_cpu():
    from iqwaveform_tpu.ops.filtering import ola_filter, oaresample, resample

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)).astype(
            'complex64'
        )
    )
    kw = dict(fs=1e6, nfft=1024, window='hamming', passband=(-2e5, 2e5),
              nfft_out=512)
    np.testing.assert_array_equal(
        np.asarray(ola_filter(x, **kw)),
        np.asarray(ola_filter(x, fft_backend='xla', **kw)),
    )
    np.testing.assert_array_equal(
        np.asarray(oaresample(x, 512, 1024, 1e6, window='hamming', axis=0)),
        np.asarray(
            oaresample(
                x, 512, 1024, 1e6, window='hamming', axis=0,
                fft_backend='xla',
            )
        ),
    )
    np.testing.assert_array_equal(
        np.asarray(resample(x, 4096)),
        np.asarray(resample(x, 4096, fft_backend='xla')),
    )


def test_upfirdn_backend_resolution():
    from iqwaveform_tpu.ops.resample_poly import (
        _resolve_upfirdn_backend,
        upfirdn,
    )

    x = jnp.zeros((4096,), jnp.complex64)
    resolved = _resolve_upfirdn_backend(x, 4001, 1, 2, tpu=True)
    assert resolved in ('xla', 'pallas')
    # default 'auto' == the resolved backend's result, bit-identical here
    h = np.hanning(63).astype('float32')
    rng = np.random.default_rng(0)
    xr = jnp.asarray(
        (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(
            'complex64'
        )
    )
    np.testing.assert_array_equal(
        np.asarray(upfirdn(h, xr, up=2, down=3)),
        np.asarray(upfirdn(h, xr, up=2, down=3, backend='xla')),
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
