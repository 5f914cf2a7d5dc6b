"""WidebandMonitor end-to-end pipeline tests.

Oracle: the single-stage ops implementations composed manually, plus
physical invariants (power conservation, tone channel location).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iqwaveform_tpu import fourier, parallel
from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor
from iqwaveform_tpu.models.monitor import BATCH_AXIS
from iqwaveform_tpu.parallel.mesh import TIME_AXIS

from conftest import make_tone_noise


@pytest.fixture(scope='module')
def design():
    return design_wideband_monitor(
        2e6,
        1e6,
        bw=0.8e6,
        channel_count=4,
        fft_size_per_channel=64,
        window='hamming',
        apd_bins=256,
        min_fft_size=255,
        fs_sdr=2e6,
    )


def test_design(design):
    assert design.nfft == 2 * design.nfft_out
    assert design.fs_out == 1e6


def test_monitor_single_chip(design):
    mon = WidebandMonitor(design)
    n = mon.min_input_multiple() * 8
    f_tone = 150e3  # in channel 2 of 4 after resample to 1 MS/s
    x = jnp.asarray(make_tone_noise(n, fs=2e6, f_tone=f_tone, snr_db=40))

    out = jax.jit(mon.step)(x)

    assert out['channel_power'].shape[1] == 4
    # channels at 1 MS/s: [-500,-250),[-250,0),[0,250),[250,500) kHz
    assert int(np.asarray(out['channel_power_mean']).argmax()) == 2

    # APD counts account for every resampled sample
    assert int(np.asarray(out['apd_counts']).sum()) == n // 2

    # psd max >= mean everywhere
    assert np.all(np.asarray(out['psd_max']) >= np.asarray(out['psd_mean']) - 1e-5)


def test_monitor_batched(design):
    mon = WidebandMonitor(design)
    n = mon.min_input_multiple() * 4
    x = np.stack(
        [make_tone_noise(n, fs=2e6, seed=i) for i in range(3)]
    ).astype('complex64')
    out = jax.jit(mon.step)(jnp.asarray(x))
    assert out['channel_power_mean'].shape == (3, 4)
    assert out['apd_counts'].shape == (3, 257)


def test_monitor_batched_packed_matches_rows():
    """on the packed kernel path, the (B, N) step (which builds the
    plane stack once outside the vmap; scripts/probe_rx_batch.py) must
    equal per-row 1-D steps exactly."""
    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=128,
        apd_navg=16, fft_backend='mxu', min_fft_size=8191,
        ola_kernel='pallas', apd_kernel='pallas', chan_kernel='pallas',
        fft_precision='high',
    )
    mon = WidebandMonitor(design)
    # the packed path needs >= 8 channelizer frames (chan_frames % 8)
    n = 4 * mon.min_input_multiple()
    rng = np.random.default_rng(5)
    x = (
        rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
    ).astype('complex64')
    assert mon._packed_applies(n)

    out_b = jax.jit(mon.step)(jnp.asarray(x))
    for i in range(3):
        out_i = jax.jit(mon.step)(jnp.asarray(x[i]))
        for key in out_i:
            np.testing.assert_array_equal(
                np.asarray(out_b[key])[i],
                np.asarray(out_i[key]),
                err_msg=f'row {i} key {key}',
            )


def test_monitor_sharded_matches_single(design):
    mesh = parallel.time_mesh(8)
    mon_s = WidebandMonitor(design, mesh=mesh)
    mon_1 = WidebandMonitor(design)

    n = mon_s.min_input_multiple(8) * 2
    x = np.stack([make_tone_noise(n, fs=2e6, seed=i) for i in range(2)]).astype(
        'complex64'
    )

    out_s = mon_s.sharded_step(jnp.asarray(x))
    out_1 = jax.jit(mon_1.step)(jnp.asarray(x))

    # channel power time series: interior frames match (the single-chip
    # path sees real samples at shard boundaries; sharded path exchanges
    # exactly those halos, so all frames should agree except the global
    # tail frame affected by zero-extension)
    a = np.asarray(out_s['channel_power'])
    b = np.asarray(out_1['channel_power'])
    np.testing.assert_allclose(a[:, :-2], b[:, : a.shape[1] - 2], rtol=2e-3, atol=1e-6)

    np.testing.assert_allclose(
        np.asarray(out_s['apd_counts']).astype(float),
        np.asarray(out_1['apd_counts']).astype(float),
        atol=32,  # tail-transient samples may land in neighboring bins
    )


def test_monitor_2d_mesh(design):
    mesh = jax.make_mesh(
        (2, 4),
        (BATCH_AXIS, TIME_AXIS),
        axis_types=(jax.sharding.AxisType.Auto,) * 2,
    )
    mon = WidebandMonitor(design, mesh=mesh)
    n = mon.min_input_multiple(4) * 2
    x = np.stack([make_tone_noise(n, fs=2e6, seed=i) for i in range(4)]).astype(
        'complex64'
    )
    out = jax.jit(mon.sharded_step)(jnp.asarray(x))
    assert np.asarray(out['channel_power_mean']).shape == (4, 4)
    assert np.isfinite(np.asarray(out['psd_mean'])).all()


def test_monitor_streaming_accumulation(design):
    """chunk-exact streaming must equal one-shot statistics."""
    mon = WidebandMonitor(design)
    chunk = mon.min_input_multiple() * 2
    n_chunks = 4
    x = make_tone_noise(chunk * n_chunks, fs=2e6, f_tone=150e3, snr_db=30)

    one_shot = jax.jit(mon.step)(jnp.asarray(x))

    acc = jax.jit(mon.accumulate_step)
    carry = mon.init_carry(chunk)
    for k in range(n_chunks):
        carry = acc(carry, jnp.asarray(x[k * chunk : (k + 1) * chunk]))
    result = jax.jit(mon.flush)(carry)

    np.testing.assert_allclose(
        np.asarray(result['psd_mean']), np.asarray(one_shot['psd_mean']),
        rtol=1e-4, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(result['psd_max']), np.asarray(one_shot['psd_max']), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(result['apd_counts']).sum(),
        np.asarray(one_shot['apd_counts']).sum(),
    )
    np.testing.assert_allclose(
        np.asarray(result['channel_power_mean']),
        np.asarray(one_shot['channel_power_mean']),
        rtol=1e-4,
    )



def test_monitor_apd_navg():
    """detector-binned APD counts n/navg bins and matches direct binning."""
    design = design_wideband_monitor(
        2e6, 1e6, bw=0.8e6, channel_count=4, fft_size_per_channel=64,
        window='hamming', apd_bins=256, min_fft_size=255, fs_sdr=2e6,
        apd_navg=16,
    )
    mon = WidebandMonitor(design)
    n = mon.min_input_multiple() * 8
    x = make_tone_noise(n, fs=2e6, f_tone=150e3, snr_db=30)
    out = jax.jit(mon.step)(jnp.asarray(x))
    assert int(np.asarray(out['apd_counts']).sum()) == (n // 2) // 16


def test_monitor_pallas_ola_kernel_matches_matmul():
    """ola_kernel='pallas' (interpret on CPU) must match the matmul path
    in the passband; stopband bins sit at the float32 roundoff floor."""
    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=512,
        apd_navg=16, fft_backend='mxu', min_fft_size=8191,
    )
    m1 = WidebandMonitor(design)
    m2 = WidebandMonitor(dataclasses.replace(design, ola_kernel='pallas'))
    assert m2._fused_ola_raw is not None, 'pallas fused path did not arm'

    n = m1.min_input_multiple()
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        'complex64'
    )
    o1 = jax.jit(m1.step)(jnp.asarray(x))
    o2 = jax.jit(m2.step)(jnp.asarray(x))

    cp1 = np.asarray(o1['channel_power'])
    cp2 = np.asarray(o2['channel_power'])
    # edge channels sit in the zeroed stopband (~1e-15 leakage power):
    # compare relative to the full-scale channel power
    np.testing.assert_allclose(cp1, cp2, atol=1e-5 * cp1.max())
    np.testing.assert_array_equal(
        np.asarray(o1['apd_counts']), np.asarray(o2['apd_counts'])
    )
    psd1, psd2 = np.asarray(o1['psd_mean']), np.asarray(o2['psd_mean'])
    inband = psd1 > -100
    assert inband.sum() > 1000
    np.testing.assert_allclose(psd1[inband], psd2[inband], atol=0.01)


def test_monitor_sharded_step_with_pallas_kernels():
    """sharded_step must run with both pallas kernels armed (interpret on
    the virtual CPU mesh) and match the single-chip pallas step."""
    mesh = parallel.time_mesh()
    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=128,
        apd_navg=16, fft_backend='mxu', min_fft_size=8191,
        ola_kernel='pallas', apd_kernel='pallas',
    )
    mon = WidebandMonitor(design, mesh=mesh)
    n_shards = mesh.shape[TIME_AXIS]
    n = mon.min_input_multiple(n_shards)
    rng = np.random.default_rng(0)
    iq = (
        rng.standard_normal((1, n)) + 1j * rng.standard_normal((1, n))
    ).astype('complex64')

    iq_sharded = jax.device_put(
        jnp.asarray(iq),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, TIME_AXIS)),
    )
    out_s = mon.sharded_step(iq_sharded)
    out_1 = jax.jit(mon.step)(jnp.asarray(iq[0]))

    np.testing.assert_array_equal(
        np.asarray(out_s['apd_counts'])[0], np.asarray(out_1['apd_counts'])
    )
    cp_s = np.asarray(out_s['channel_power_mean'])[0]
    cp_1 = np.asarray(out_1['channel_power_mean'])
    np.testing.assert_allclose(cp_s, cp_1, atol=1e-5 * cp_1.max())


def test_monitor_chan_kernel_matches_xla():
    """chan_kernel='pallas' (interpret on CPU) must match the XLA
    channelizer path: exact APD, close channel power, in-band psd."""
    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=256,
        apd_navg=16, fft_backend='mxu', min_fft_size=8191,
    )
    m1 = WidebandMonitor(design)
    m2 = WidebandMonitor(dataclasses.replace(design, chan_kernel='pallas'))
    assert m2._chan_stats is not None, 'chan pallas path did not arm'

    # the kernel requires a multiple of 8 frames (fewer falls back to
    # XLA, which would make this comparison vacuous)
    n = m1.min_input_multiple() * 8
    hop_out = design.nfft_out - m1.noverlap_out
    n_frames = (n // m1.hop_in) * hop_out // (
        design.fft_size_per_channel * design.channel_count
    )
    assert n_frames % 8 == 0 and n_frames >= 8
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        'complex64'
    )
    o1 = jax.jit(m1.step)(jnp.asarray(x))
    o2 = jax.jit(m2.step)(jnp.asarray(x))

    np.testing.assert_array_equal(
        np.asarray(o1['apd_counts']), np.asarray(o2['apd_counts'])
    )
    cp1 = np.asarray(o1['channel_power'])
    np.testing.assert_allclose(
        cp1, np.asarray(o2['channel_power']), atol=1e-5 * cp1.max()
    )
    psd1, psd2 = np.asarray(o1['psd_mean']), np.asarray(o2['psd_mean'])
    inband = psd1 > -100
    assert inband.sum() > 1000
    np.testing.assert_allclose(psd1[inband], psd2[inband], atol=0.01)
    mx1, mx2 = np.asarray(o1['psd_max']), np.asarray(o2['psd_max'])
    np.testing.assert_allclose(mx1[inband], mx2[inband], atol=0.01)


def test_monitor_chan_kernel_trim_matches_xla():
    """the 192-of-256 analysis trim (BASELINE config #4 semantics) now
    runs the fused chan kernel (VERDICT r2 #3) and must match the XLA
    trim path."""
    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, analysis_bins_per_channel=192,
        window='hamming', apd_bins=256, apd_navg=16,
        fft_backend='mxu', min_fft_size=8191,
    )
    m1 = WidebandMonitor(design)
    m2 = WidebandMonitor(dataclasses.replace(design, chan_kernel='pallas'))
    assert m2._chan_stats is not None, 'trim chan pallas path did not arm'

    n = m1.min_input_multiple() * 8
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        'complex64'
    )
    o1 = jax.jit(m1.step)(jnp.asarray(x))
    o2 = jax.jit(m2.step)(jnp.asarray(x))

    np.testing.assert_array_equal(
        np.asarray(o1['apd_counts']), np.asarray(o2['apd_counts'])
    )
    cp1 = np.asarray(o1['channel_power'])
    assert cp1.shape[-1] == 16
    np.testing.assert_allclose(
        cp1, np.asarray(o2['channel_power']), atol=1e-5 * cp1.max()
    )
    psd1, psd2 = np.asarray(o1['psd_mean']), np.asarray(o2['psd_mean'])
    inband = psd1 > -100
    np.testing.assert_allclose(psd1[inband], psd2[inband], atol=0.01)


def test_monitor_chan_kernel_unsupported_config_raises():
    # 6 kept bins per channel with a=32 sublane rows puts several channel
    # boundaries inside one factored lane -> still unsupported
    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=512,
        fft_size_per_channel=8, analysis_bins_per_channel=6,
        window='hamming', fft_backend='mxu', min_fft_size=8191,
        chan_kernel='pallas',
    )
    with pytest.raises(ValueError, match='boundary'):
        WidebandMonitor(design)


def test_monitor_streaming_accumulate_with_fast_kernels():
    """chunk-exact streaming must match one-shot step() with all pallas
    kernels armed (interpret on CPU)."""
    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=128,
        apd_navg=16, fft_backend='mxu', min_fft_size=8191,
        ola_kernel='pallas', apd_kernel='pallas', chan_kernel='pallas',
        fft_precision='high',
    )
    mon = WidebandMonitor(design)
    chunk = mon.min_input_multiple() * 8
    n_chunks = 2
    rng = np.random.default_rng(3)
    x = (
        rng.standard_normal(chunk * n_chunks)
        + 1j * rng.standard_normal(chunk * n_chunks)
    ).astype('complex64')

    one_shot = jax.jit(mon.step)(jnp.asarray(x))

    acc = jax.jit(mon.accumulate_step)
    carry = mon.init_carry(chunk)
    for k in range(n_chunks):
        carry = acc(carry, jnp.asarray(x[k * chunk : (k + 1) * chunk]))
    out = jax.jit(mon.flush)(carry)

    # the one-shot step runs the packed pallas kernels, the streaming
    # chunk path the XLA einsums: two valid 3-pass roundings, so a few
    # borderline samples may land one histogram bin over
    apd1 = np.asarray(one_shot['apd_counts']).astype(int)
    apd2 = np.asarray(out['apd_counts']).astype(int)
    assert apd1.sum() == apd2.sum()
    assert np.abs(apd1 - apd2).sum() <= 8
    cp1 = np.asarray(one_shot['channel_power_mean'])
    np.testing.assert_allclose(
        cp1, np.asarray(out['channel_power_mean']), atol=1e-5 * cp1.max()
    )
    psd1 = np.asarray(one_shot['psd_mean'])
    inband = psd1 > -100
    # one-shot OLA uses the pallas 3-pass kernel while the streaming
    # chunk path uses the XLA HIGH einsums: two valid 3-pass roundings
    np.testing.assert_allclose(
        psd1[inband], np.asarray(out['psd_mean'])[inband], atol=0.05
    )


def test_monitor_sharded_step_fully_packed(mesh=None):
    """the fully-packed body (planes halo exchange + row-shifted
    overlap-add) must match the single-chip packed step on the mesh."""
    mesh = parallel.time_mesh()
    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=128,
        apd_navg=16, fft_backend='mxu', min_fft_size=8191,
        ola_kernel='pallas', apd_kernel='pallas', chan_kernel='pallas',
        fft_precision='high',
    )
    mon = WidebandMonitor(design, mesh=mesh)
    n_shards = mesh.shape[TIME_AXIS]
    n = mon.min_input_multiple(n_shards) * 8
    assert mon._packed_applies(n // n_shards), 'packed path must engage per shard'
    rng = np.random.default_rng(0)
    iq = (
        rng.standard_normal((1, n)) + 1j * rng.standard_normal((1, n))
    ).astype('complex64')

    iq_sharded = jax.device_put(
        jnp.asarray(iq),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, TIME_AXIS)
        ),
    )
    out_s = mon.sharded_step(iq_sharded)
    out_1 = jax.jit(mon.step)(jnp.asarray(iq[0]))

    np.testing.assert_array_equal(
        np.asarray(out_s['apd_counts'])[0], np.asarray(out_1['apd_counts'])
    )
    cp_s = np.asarray(out_s['channel_power_mean'])[0]
    cp_1 = np.asarray(out_1['channel_power_mean'])
    np.testing.assert_allclose(cp_s, cp_1, atol=1e-5 * cp_1.max())
    psd_s = np.asarray(out_s['psd_mean'])[0]
    psd_1 = np.asarray(out_1['psd_mean'])
    inband = psd_1 > -100
    np.testing.assert_allclose(psd_s[inband], psd_1[inband], atol=0.01)


@pytest.mark.parametrize(
    'window,bw_frac',
    [('hamming', 0.5), ('blackman', 0.7), ('blackmanharris', None)],
)
def test_monitor_fast_config_across_designs(window, bw_frac):
    """fast-kernel configs must match the baseline across windows and
    passbands — whether the packed path engages or falls back."""
    fs = 30.72e6
    bw = None if bw_frac is None else bw_frac * fs / 2
    kws = dict(
        fs_sdr=fs, channel_count=8, fft_size_per_channel=128,
        window=window, apd_bins=64, apd_navg=8, fft_backend='mxu',
        min_fft_size=2047,
    )
    if bw is not None:
        kws['bw'] = bw
    base = design_wideband_monitor(fs, fs / 2, **kws)
    fast = dataclasses.replace(
        base, ola_kernel='pallas', apd_kernel='pallas',
        chan_kernel='pallas', fft_precision='high',
    )
    m1, m2 = WidebandMonitor(base), WidebandMonitor(fast)

    n = m1.min_input_multiple() * 8
    rng = np.random.default_rng(7)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        'complex64'
    )
    o1 = jax.jit(m1.step)(jnp.asarray(x))
    o2 = jax.jit(m2.step)(jnp.asarray(x))

    apd1 = np.asarray(o1['apd_counts'])
    apd2 = np.asarray(o2['apd_counts'])
    assert apd1.sum() == apd2.sum()
    # precision-tier roundoff may shift isolated samples one bin over
    assert np.abs(apd1 - apd2).sum() <= max(2, apd1.sum() // 1000)
    cp1 = np.asarray(o1['channel_power_mean'])
    np.testing.assert_allclose(
        cp1, np.asarray(o2['channel_power_mean']), atol=1e-4 * cp1.max()
    )
    p1, p2 = np.asarray(o1['psd_mean']), np.asarray(o2['psd_mean'])
    inb = p1 > -90
    assert inb.sum() > 50
    np.testing.assert_allclose(p1[inb], p2[inb], atol=0.05)


def test_profile_step(design):
    """profile_step gives a two-stage attribution and a printable report."""
    mon = WidebandMonitor(design)
    n = mon.min_input_multiple() * 4
    x = jnp.asarray(make_tone_noise(n, fs=2e6))
    timer = mon.profile_step(x, reps=1)
    assert set(timer.durations) == {'ola_resample', 'chan_stats_apd'}
    assert timer.durations['ola_resample'] > 0
    assert 'ola_resample' in timer.report()

    # packed (2, N) float32 planes: the H2D layout bench.py ships (the
    # axon tunnel cannot transfer complex64 host->device)
    planes = jnp.stack([x.real, x.imag]).astype(jnp.float32)
    timer_p = mon.profile_step(planes, reps=1)
    assert set(timer_p.durations) == {'ola_resample', 'chan_stats_apd'}

    with pytest.raises(ValueError):
        mon.profile_step(x[None, :])


def test_monitor_bf16_mode():
    """fft_precision='bf16' (bf16 frame storage + 1-pass dots) tracks the
    'highest' oracle at its documented ~4e-3 relative / ~0.05 dB level."""
    fs = 30.72e6
    kws = dict(
        fs_sdr=fs, channel_count=8, fft_size_per_channel=128,
        window='hamming', apd_bins=64, apd_navg=8, fft_backend='mxu',
        min_fft_size=2047,
    )
    base = design_wideband_monitor(fs, fs / 2, **kws)
    fast = dataclasses.replace(
        base, ola_kernel='pallas', apd_kernel='pallas',
        chan_kernel='pallas', fft_precision='bf16',
    )
    m1, m2 = WidebandMonitor(base), WidebandMonitor(fast)

    n = m1.min_input_multiple() * 8
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        'complex64'
    )
    o1 = jax.jit(m1.step)(jnp.asarray(x))
    o2 = jax.jit(m2.step)(jnp.asarray(x))

    # every resampled sample still lands in the histogram
    assert (
        np.asarray(o1['apd_counts']).sum()
        == np.asarray(o2['apd_counts']).sum()
    )
    cp1 = np.asarray(o1['channel_power_mean'])
    np.testing.assert_allclose(
        cp1, np.asarray(o2['channel_power_mean']), rtol=2e-2
    )
    p1, p2 = np.asarray(o1['psd_mean']), np.asarray(o2['psd_mean'])
    inb = p1 > -90
    assert inb.sum() > 50
    np.testing.assert_allclose(p1[inb], p2[inb], atol=0.15)


def test_monitor_step_planes_matches_complex_step():
    """step_planes on float32 planes is the same computation as
    step(unpack_iq(planes))."""
    from iqwaveform_tpu.utils import unpack_iq

    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=128,
        apd_navg=16, fft_backend='mxu', min_fft_size=8191,
        ola_kernel='pallas', apd_kernel='pallas', chan_kernel='pallas',
        fft_precision='high',
    )
    mon = WidebandMonitor(design)
    n = mon.min_input_multiple() * 8
    rng = np.random.default_rng(0)
    planes = rng.standard_normal((2, n)).astype('float32')

    o1 = jax.jit(lambda p: mon.step(unpack_iq(p)))(jnp.asarray(planes))
    o2 = jax.jit(mon.step_planes)(jnp.asarray(planes))
    for k in o1:
        np.testing.assert_allclose(
            np.asarray(o1[k]), np.asarray(o2[k]), rtol=1e-6, atol=1e-6
        )

    # misaligned length raises instead of silently downgrading paths
    with pytest.raises(ValueError, match='packed'):
        mon.step_planes(jnp.asarray(planes[:, : n - 128]))


def test_monitor_i16_tier_matches_high():
    """fft_precision='i16' (int16 frame storage, ADC scale folded into
    the kernel window) matches the 'high' tier fed the same values as
    float32 (VERDICT r2 #6: a halved-traffic tier that is lossless for
    natively integer captures)."""
    common = dict(
        bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=128,
        apd_navg=16, fft_backend='mxu', min_fft_size=8191,
        ola_kernel='pallas', apd_kernel='pallas', chan_kernel='pallas',
    )
    scale = 2.0**-11
    d_i16 = design_wideband_monitor(
        122.88e6, 61.44e6, fft_precision='i16', input_scale=scale, **common
    )
    d_high = design_wideband_monitor(
        122.88e6, 61.44e6, fft_precision='high', **common
    )
    m_i16 = WidebandMonitor(d_i16)
    m_high = WidebandMonitor(d_high)

    n = m_i16.min_input_multiple() * 8
    rng = np.random.default_rng(1)
    counts = rng.integers(-2048, 2048, size=(2, n)).astype('int16')

    o_i16 = jax.jit(m_i16.step_planes)(jnp.asarray(counts))
    o_high = jax.jit(m_high.step_planes)(
        jnp.asarray((counts.astype('float32') * scale))
    )
    for k in ('channel_power', 'psd_mean', 'apd_counts'):
        a, b = np.asarray(o_high[k]), np.asarray(o_i16[k])
        if k == 'apd_counts':
            assert np.abs(a - b).max() <= 1, k
        else:
            np.testing.assert_allclose(b, a, atol=2e-5 * np.abs(a).max(), err_msg=k)


def test_monitor_i16_requires_pallas():
    with pytest.raises(ValueError, match='i16'):
        WidebandMonitor(
            design_wideband_monitor(
                122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6,
                fft_precision='i16', min_fft_size=8191,
            )
        )


def test_monitor_apd_packed_matches_sort():
    """apd_kernel='packed' (factored dB-space counting) must match the
    sort+searchsorted counts up to edge-tie rounding: totals exact,
    cumulative counts within 2."""
    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=2048,
        apd_navg=16, fft_backend='mxu', min_fft_size=8191,
    )
    m1 = WidebandMonitor(design)
    m2 = WidebandMonitor(dataclasses.replace(design, apd_kernel='packed'))

    n = m1.min_input_multiple()
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        'complex64'
    )
    c1 = np.asarray(jax.jit(m1.step)(jnp.asarray(x))['apd_counts'])
    c2 = np.asarray(jax.jit(m2.step)(jnp.asarray(x))['apd_counts'])

    assert c1.sum() == c2.sum()
    assert np.abs(np.cumsum(c1) - np.cumsum(c2)).max() <= 2
    # other deliverables are untouched by the APD kernel choice
    assert c2.shape == (design.apd_bins + 1,)


def test_monitor_apd_packed_pad_path():
    """packed APD with a binned-sample count that is not a multiple of
    128 exercises the pad-level branch (padding must count nowhere)."""
    design = design_wideband_monitor(
        2e6, 1e6, bw=0.8e6, channel_count=4, fft_size_per_channel=64,
        window='hamming', apd_bins=256, min_fft_size=255, fs_sdr=2e6,
        apd_navg=4,
    )
    m1 = WidebandMonitor(design)
    m2 = WidebandMonitor(dataclasses.replace(design, apd_kernel='packed'))
    n = m1.min_input_multiple() * 3
    x = make_tone_noise(n, fs=2e6, f_tone=150e3, snr_db=30)
    c1 = np.asarray(jax.jit(m1.step)(jnp.asarray(x))['apd_counts'])
    c2 = np.asarray(jax.jit(m2.step)(jnp.asarray(x))['apd_counts'])
    assert c1.sum() == c2.sum() == (n // 2) // 4
    assert np.abs(np.cumsum(c1) - np.cumsum(c2)).max() <= 2


def _small_packed_design():
    """smallest design that arms the fully-packed kernel path."""
    fs = 30.72e6
    return design_wideband_monitor(
        fs, fs / 2, bw=10e6, fs_sdr=fs, channel_count=8,
        fft_size_per_channel=128, window='hamming', apd_bins=64,
        apd_navg=8, fft_backend='mxu', min_fft_size=2047,
        ola_kernel='pallas', apd_kernel='pallas', chan_kernel='pallas',
        fft_precision='high',
    )


def test_monitor_packed_misaligned_length_falls_back():
    """a capture length with a partial trailing OLA hop must fall back to
    the unpacked body (the strided packed kernel reshapes the whole
    plane into hop rows, so there is no defined frame/halo alignment)
    instead of crashing at trace time; step_planes rejects it."""
    mon = WidebandMonitor(_small_packed_design())
    # min_input_multiple guarantees unpacked alignment; the packed path
    # additionally needs a multiple-of-8 channelizer frame count
    n = mon.min_input_multiple() * 8
    assert mon._packed_applies(n)
    # a 128-aligned remainder below one hop leaves n_frames (and every
    # other alignment check) unchanged — only the hop multiple fails
    n_mis = n + 128
    assert not mon._packed_applies(n_mis)

    x = jnp.asarray(make_tone_noise(n_mis, fs=30.72e6, f_tone=3e6))
    out = jax.jit(mon.step)(x)  # unpacked fallback, no trace-time crash
    assert np.isfinite(np.asarray(out['psd_mean'])).all()

    planes = jnp.stack([x.real, x.imag]).astype(jnp.float32)
    with pytest.raises(ValueError, match='packed'):
        mon.step_planes(planes)


def test_profile_step_packed():
    """profile_step must run with the packed resample prefix armed
    (regression: the ola_resample stage passed complex input where the
    packed body requires (2, N) planes)."""
    mon = WidebandMonitor(_small_packed_design())
    n = mon.min_input_multiple() * 8
    assert mon._packed_applies(n)
    x = jnp.asarray(make_tone_noise(n, fs=30.72e6, f_tone=3e6))

    timer = mon.profile_step(x, reps=1)
    assert set(timer.durations) == {'ola_resample', 'chan_stats_apd'}
    assert timer.durations['ola_resample'] > 0

    planes = jnp.stack([x.real, x.imag]).astype(jnp.float32)
    timer_p = mon.profile_step(planes, reps=1)
    assert set(timer_p.durations) == {'ola_resample', 'chan_stats_apd'}


def test_monitor_apd_auto_kernel():
    """apd_kernel='auto' resolves to a TPU counting kernel by the
    trace-time binned sample count and matches the 'sort' oracle."""
    design = design_wideband_monitor(
        2e6, 1e6, bw=0.8e6, channel_count=4, fft_size_per_channel=64,
        window='hamming', apd_bins=256, min_fft_size=255, fs_sdr=2e6,
        apd_navg=4,
    )
    m1 = WidebandMonitor(design)
    m2 = WidebandMonitor(dataclasses.replace(design, apd_kernel='auto'))
    n = m1.min_input_multiple() * 3
    x = make_tone_noise(n, fs=2e6, f_tone=150e3, snr_db=30)
    c1 = np.asarray(jax.jit(m1.step)(jnp.asarray(x))['apd_counts'])
    c2 = np.asarray(jax.jit(m2.step)(jnp.asarray(x))['apd_counts'])
    # below the ~2M-sample crossover 'auto' is the edge-compare kernel,
    # whose counts are identical to the sort path
    np.testing.assert_array_equal(c1, c2)

    with pytest.raises(ValueError, match='apd_kernel'):
        WidebandMonitor(dataclasses.replace(design, apd_kernel='nope'))
