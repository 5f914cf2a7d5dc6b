"""Benchmark: wideband-monitor pipeline throughput on one TPU chip.

Measures the flagship end-to-end path (BASELINE.json configs #2/#4/#5,
single chip): OLA bandpass + 2:1 rational resample -> channelizer STFT ->
spectrogram statistics -> APD histogram, one jit program, complex64.

Prints ONE JSON line:
  {"metric": ..., "value": MS/s, "unit": "MS/s", "vs_baseline": ...}

vs_baseline normalizes against the BASELINE.json north star expressed per
chip: 50x real time on a 122.88 MS/s capture across v5e-8 = 768 MS/s/chip.
vs_baseline >= 1.0 means the single-chip target is met.

Robustness: the tunneled axon backend intermittently wedges inside
uninterruptible native calls, so each configuration runs in its own
subprocess under a hard timeout; configurations are tried from the full
monitor down to a plain spectrogram pipeline and the first that completes
is reported (metric name identifies which).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

PER_CHIP_TARGET_MSPS = 50 * 122.88 / 8  # = 768 MS/s per chip


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _measure(step, x, fence_key=None, trials=3):
    """difference timing with a float32-readback fence (axon's
    block_until_ready returns at dispatch; execution is in-order, so
    reading the last output fences the queue).

    The per-trial estimate (t_12reps - t_2reps)/10 subtracts the fixed
    tunnel round-trip, but a hiccup landing in the SUBTRACTED 2-rep term
    biases throughput up (and one in the 12-rep term biases it down) —
    take the median over several trials, and when the trials disagree
    by more than 1.5x (an erratic tunnel phase) double the trial count
    before trusting the median."""

    def run_and_fence(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = step(x)
        leaf = out[fence_key] if fence_key else out
        np.asarray(leaf)
        return time.perf_counter() - t0

    t_compile = run_and_fence(1)
    _log(f'bench: compile+first step {t_compile:.1f}s')
    run_and_fence(2)  # warm
    reps_lo, reps_hi = 2, 12

    def trial():
        t_lo = run_and_fence(reps_lo)
        t_hi = run_and_fence(reps_hi)
        return (t_hi - t_lo) / (reps_hi - reps_lo)

    dts = [trial() for _ in range(trials)]
    if max(dts) > 1.5 * max(min(dts), 1e-9):
        dts += [trial() for _ in range(trials)]
        _log('bench: inconsistent trials, extended')
    _log('bench: trial dts [ms] ' + ', '.join(f'{d * 1e3:.2f}' for d in dts))
    return float(np.median(dts))


def bench_monitor(nfft_hint: int, ola_kernel: str = 'matmul', fft_precision: str = 'highest', apd_kernel: str = 'sort', chan_kernel: str = 'xla'):
    """full monitor pipeline (resample -> channelize -> stats -> APD)."""
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor
    from iqwaveform_tpu.utils import unpack_iq

    design = design_wideband_monitor(
        122.88e6,
        61.44e6,
        bw=40e6,
        fs_sdr=122.88e6,
        channel_count=16,
        fft_size_per_channel=256,
        window='hamming',
        apd_bins=2048,
        # detector-binned APD (the reference CCDF workflow bins power by a
        # detector period first: figures.py:827-836)
        apd_navg=16,
        # four-step DFT-matmul FFTs on the MXU (ops.mxu_fft)
        fft_backend='mxu',
        # 'pallas' = VMEM-resident fused OLA kernel; with the 3-pass bf16
        # split ('high') it is ~1.55x faster than the XLA einsum path at
        # ~7e-6 RMS (see ops/pallas/fused_ola_pallas.py)
        ola_kernel=ola_kernel,
        # 'pallas' = direct edge-compare histogram (identical counts,
        # ~3x faster; see ops/pallas/hist_pallas.py)
        apd_kernel=apd_kernel,
        # 'pallas' = single-pass channelizer statistics kernel
        # (ops/pallas/chan_stats_pallas.py)
        chan_kernel=chan_kernel,
        fft_precision=fft_precision,
        min_fft_size=nfft_hint - 1,
    )
    mon = WidebandMonitor(design)
    _log(
        f'bench: monitor nfft={design.nfft}->{design.nfft_out} '
        f'ola_kernel={ola_kernel} precision={fft_precision}'
    )

    quantum = mon.min_input_multiple()
    n = int(np.ceil(2**24 / quantum)) * quantum

    rng = np.random.default_rng(0)
    # ship IQ as float32 (real, imag) planes: the axon tunnel rejects
    # complex64 host->device transfers; complex is rebuilt inside jit
    ri = jnp.asarray(
        np.stack([rng.standard_normal(n), rng.standard_normal(n)]).astype(
            'float32'
        )
    )

    step = jax.jit(lambda planes: mon.step(unpack_iq(planes)))
    dt = _measure(step, ri, fence_key='psd_mean')
    tag = '_pallas' if ola_kernel == 'pallas' else ''
    if fft_precision == 'bf16':
        tag += '_bf16'
    return f'monitor_pipeline_nfft{design.nfft}{tag}_1chip', n / dt / 1e6


def bench_monitor_default():
    """the OUT-OF-BOX monitor: design_wideband_monitor with no kernel or
    backend arguments. All five knobs default to 'auto' and resolve at
    WidebandMonitor construction (models.resolve_monitor_design), so
    this must land within noise of the tuned monitor8192p config — the
    proof that the benched speed is the default, not an opt-in
    (VERDICT r3 #1)."""
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor
    from iqwaveform_tpu.utils import unpack_iq

    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=2048,
        apd_navg=16, min_fft_size=8191,
    )
    mon = WidebandMonitor(design)
    d = mon.design
    _log(
        f'bench: default design resolved fft_backend={d.fft_backend} '
        f'precision={d.fft_precision} ola={d.ola_kernel} '
        f'apd={d.apd_kernel} chan={d.chan_kernel}'
    )

    quantum = mon.min_input_multiple()
    n = int(np.ceil(2**24 / quantum)) * quantum
    rng = np.random.default_rng(0)
    ri = jnp.asarray(
        np.stack([rng.standard_normal(n), rng.standard_normal(n)]).astype(
            'float32'
        )
    )
    step = jax.jit(lambda planes: mon.step(unpack_iq(planes)))
    dt = _measure(step, ri, fence_key='psd_mean')
    return 'monitor_pipeline_default_1chip', n / dt / 1e6


def bench_monitor_i16():
    """fft_precision='i16': int16 frame planes (the native SigMF ci16
    capture format) with the ADC scale folded into the kernel window —
    the same halved HBM frame traffic as the bf16 tier, but lossless
    for integer captures (accuracy = the 'high' tier)."""
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor

    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=2048,
        apd_navg=16, fft_backend='mxu', ola_kernel='pallas',
        apd_kernel='pallas', chan_kernel='pallas',
        fft_precision='i16', input_scale=2.0**-11, min_fft_size=8191,
    )
    mon = WidebandMonitor(design)
    quantum = mon.min_input_multiple()
    n = int(np.ceil(2**24 / quantum)) * quantum
    _log(f'bench: monitor i16 nfft={design.nfft}->{design.nfft_out}')

    # int16 planes generated on device (models a ci16 capture already
    # resident; H2D int16 through the tunnel is separately exercised by
    # the disk->chip example)
    key = jax.random.PRNGKey(0)
    counts = jax.jit(
        lambda k: jnp.round(
            jax.random.normal(k, (2, n), jnp.float32) * 1024.0
        ).astype(jnp.int16)
    )(key)

    step = jax.jit(mon.step_planes)
    dt = _measure(step, counts, fence_key='psd_mean')
    return f'monitor_pipeline_nfft{design.nfft}_i16_1chip', n / dt / 1e6


def bench_spectrogram():
    """BASELINE config #1: 1024-pt Hann spectrogram + envelope power
    stats (mean/max/min dB per bin), via the library's persistence
    primitives with the factored-order MXU transform (hist_bins=0 =
    stats-only fold; parallel/streaming.py)."""
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.parallel.streaming import (
        design_persistence,
        persistence_fold,
        persistence_init,
    )

    n = 2**24
    nperseg = 1024
    rng = np.random.default_rng(0)
    ri = jnp.asarray(
        np.stack([rng.standard_normal(n), rng.standard_normal(n)]).astype(
            'float32'
        )
    )
    design = design_persistence(
        nfft=nperseg, window='hann', hist_bins=0,
        fft_backend='pallas', fft_precision='high',
    )

    @jax.jit
    def step(planes):
        # planes feed the fold directly (round 3: the stats-only fused
        # kernel's accumulators are the only HBM writes)
        c = persistence_fold(persistence_init(design), planes, design)
        out = jnp.stack([c.psum / c.count, c.pmax, c.pmin])
        # factored -> monotonic bin order (timed: it is part of the
        # deliverable, though only a (3, nfft) gather)
        return out[:, design['unscramble']]

    dt = _measure(step, ri)
    extras = [('spectrogram_frames_per_s_1chip', (n // nperseg) / dt, 'frames/s')]
    return 'spectrogram_stats_1chip', n / dt / 1e6, extras


def bench_monitor_rx(rx: int):
    """receiver-batched monitor (ROADMAP item: amortize dispatch over a
    stacked rx_batch axis; same per-sample math as monitor8192p)."""
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor
    from iqwaveform_tpu.utils import unpack_iq

    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=2048,
        apd_navg=16, fft_backend='mxu', ola_kernel='pallas',
        apd_kernel='pallas', chan_kernel='pallas', fft_precision='high',
        min_fft_size=8191,
    )
    mon = WidebandMonitor(design)
    quantum = mon.min_input_multiple()
    n_row = int(np.ceil(2**24 / rx / quantum)) * quantum
    n = rx * n_row

    rng = np.random.default_rng(0)
    ri = jnp.asarray(
        np.stack(
            [rng.standard_normal((rx, n_row)), rng.standard_normal((rx, n_row))]
        ).astype('float32')
    )

    step = jax.jit(lambda planes: mon.step(unpack_iq(planes)))
    dt = _measure(step, ri, fence_key='psd_mean')
    return f'monitor_pipeline_rx{rx}_1chip', n / dt / 1e6, []


def bench_streaming():
    """BASELINE config #3: streaming APD + persistence spectrum over a
    1 GS capture at fixed device memory (donated carry).

    Honesty notes. (1) Every fold consumes a DIFFERENT device-resident
    chunk (the scan walks a 30-chunk stack): feeding one chunk to all
    folds lets XLA hoist the entire fold out of the scan as
    loop-invariant code, which silently benchmarked 1 fold as N
    (684 "MS/s" in an earlier round — wrong; see docs/BENCH_notes).
    (2) The APD is the detector-binned APD of the reference CCDF
    workflow (figures.py:827-836) and the flagship monitor: power is
    mean-binned by a navg=16 detector period before histogramming,
    which replaces a 35 ms full-chunk sort with an MXU binning matmul
    + Pallas edge-compare histogram. The persistence histogram remains
    exact per-frame counts."""
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.parallel.streaming import (
        design_persistence,
        persistence_apd_fold,
        persistence_finalize,
        persistence_init,
    )

    nfft = 1024
    chunk = 2**24  # 16.78 Ms per fold
    n_folds = 60  # >= 1.0e9 samples total
    hist_bins = 1024
    apd_navg = 16  # detector period (reference CCDF workflow bins first)

    apd_edges = (10 ** (np.linspace(-120.0, 30.0, 513) / 10.0)).astype('float32')
    # fused window->DFT->dB Pallas kernel at the hi/lo bf16 3-pass tier
    # (~0.02 dB worst-case on low-power bins vs the f32 mxu path —
    # a tenth of the 0.2 dB histogram bin width; docs/BENCH_notes.md)
    design = design_persistence(
        nfft=nfft, window='hann', hist_bins=hist_bins,
        fft_backend='pallas', fft_precision='high',
    )

    # the fold composes the library's streaming primitives (the bench
    # measures the public parallel.streaming path, not a bespoke loop);
    # chunks stay (2, n) float planes end to end — the combined fold
    # reads each chunk exactly once (persistence + detector-binned APD
    # from one kernel pass, round 3)
    def fold(carry, planes):
        pcarry, apd = carry
        return persistence_apd_fold(
            pcarry, apd, planes, design,
            apd_edges=apd_edges, apd_navg=apd_navg, apd_kernel='pallas',
        )

    # scan a batch of folds per dispatch: each dispatch costs ~10 ms of
    # tunnel round-trip + sync on top of the folds themselves (measured
    # round 3 by reconciling scan wall-clock against difference-timed
    # standalone folds). 60 folds/dispatch cycle a 30-chunk stack by
    # index modulo (a dynamic slice per iteration, exactly what scan-
    # over-xs does; the body depends on the index, so nothing hoists) —
    # ~4 GB of HBM for the stack, ~4% dispatch overhead halved to ~2%.
    # A production pipeline without the tunnel would dispatch folds
    # individually (CapturePrefetcher keeps them fed).
    stack_chunks = 30
    folds_per_dispatch = 60

    def run_folds(carry, stack):
        def body(c, i):
            planes = jax.lax.dynamic_index_in_dim(
                stack, i % stack_chunks, axis=0, keepdims=False
            )
            return fold(c, planes), None

        return jax.lax.scan(
            body, carry, jnp.arange(folds_per_dispatch, dtype=jnp.int32)
        )[0]

    step = jax.jit(run_folds, donate_argnums=0)

    # 30 distinct chunks (~4 GB of HBM), generated on device (H2D of
    # that much data through the tunnel would dominate; production
    # overlap is the prefetcher's job)
    key = jax.random.PRNGKey(0)
    stack = jax.jit(
        lambda k: jax.random.normal(
            k, (stack_chunks, 2, chunk), jnp.float32
        )
    )(key)
    carry = (
        persistence_init(design),
        jnp.zeros((apd_edges.shape[0] + 1,), jnp.int32),
    )

    t0 = time.perf_counter()
    carry = step(carry, stack)
    np.asarray(carry[0].psum)
    _log(f'streaming: compile+first dispatch {time.perf_counter() - t0:.1f}s')

    n_dispatch = -(-n_folds // folds_per_dispatch)
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        carry = step(carry, stack)
    np.asarray(carry[0].psum)  # f32 fence (execution is in-order)
    dt = time.perf_counter() - t0

    # readout: quantiles + factored->natural bin unscramble (one small
    # gather, untimed like the final host readback)
    persistence_finalize(carry[0], design, fs=122.88e6)

    total = n_dispatch * folds_per_dispatch * chunk
    _log(f'streaming: {total / 1e9:.2f} GS in {dt:.2f}s')
    return 'streaming_apd_persistence_1GS_1chip', total / dt / 1e6, []


def bench_psd():
    """one-shot persistence PSD with quantiles (the reference's flagship
    entry point, fourier.py:1236-1327): the factored fast path with
    histogram quantiles (VERDICT r2 #4), the DEFAULT call (fft_backend
    'auto' -> fused factored spectrogram, quantiles exact), and the
    forced-XLA sort path."""
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.ops.spectral import power_spectral_density
    from iqwaveform_tpu.utils import unpack_iq

    fs = 122.88e6
    n = 2**24
    nfft = 1024
    stats = ['mean', 'max', 0.5, 0.95, 0.99]
    rng = np.random.default_rng(0)
    ri = jnp.asarray(
        np.stack([rng.standard_normal(n), rng.standard_normal(n)]).astype(
            'float32'
        )
    )

    kw = dict(fs=fs, window='hann', resolution=fs / nfft, statistics=stats)
    fast = jax.jit(
        lambda p: power_spectral_density(
            unpack_iq(p), fft_backend='pallas', quantile_method='histogram',
            **kw,
        )
    )
    # no backend argument: fft_backend='auto' resolves on-platform (the
    # fused factored spectrogram here), quantiles stay EXACT. NOT
    # wrapped in jit: the exact refinement is a host-orchestrated
    # multi-pass (its folds are jitted internally), so the timing below
    # includes its real host-side planning cost; under jit the library
    # would fall back to the device-sort exact path instead.
    _unp = jax.jit(unpack_iq)
    default = lambda p: power_spectral_density(_unp(p), **kw)
    xla = jax.jit(
        lambda p: power_spectral_density(unpack_iq(p), fft_backend='xla', **kw)
    )

    dt_fast = _measure(fast, ri)
    dt_default = _measure(default, ri)
    dt_xla = _measure(xla, ri)
    _log(
        f'psd: fast {n / dt_fast / 1e6:.0f} MS/s vs default '
        f'{n / dt_default / 1e6:.0f} MS/s vs xla '
        f'{n / dt_xla / 1e6:.0f} MS/s ({dt_xla / dt_fast:.2f}x)'
    )
    extras = [
        ('psd_quantiles_default_1chip', n / dt_default / 1e6, 'MS/s'),
        ('psd_quantiles_xla_1chip', n / dt_xla / 1e6, 'MS/s'),
        ('psd_fast_vs_xla_speedup', dt_xla / dt_fast, 'x'),
    ]
    return 'psd_quantiles_1chip', n / dt_fast / 1e6, extras


def bench_upfirdn():
    """BASELINE config #2 as polyphase upfirdn (VERDICT r4 #3): FIR
    lowpass + 2:1 decimation of a 100 Ms capture at 61.44 -> 30.72 MS/s
    with a 4001-tap least-squares filter (design_fir_resampler +
    design_fir_lpf), the workload behind the reference's one substantive
    performance claim — cuSignal's O(N/P) polyphase over O(N*Q) direct
    (reference cuda.py:483-486).

    Measures the two DIRECT upfirdn routes for the deliverable:
      * the XLA lhs-dilated/strided MXU conv (ops.resample_poly)
      * the hand-scheduled Pallas block-Toeplitz kernel (upfirdn_pallas)
    The headline is the best direct path; fourier.upfirdn's
    backend='auto' crossover is set from these numbers
    (ops/resample_poly.py::_resolve_upfirdn_backend). The OLA route and
    the fractional up/down point live in the companion
    `upfirdn_routes100ms` config — the four variants together were 4
    cold remote compiles and overran the session budget (round-5
    session-1 timeout), so each config carries two."""
    n, path = _upfirdn_setup()
    from iqwaveform_tpu.ops.filtering import (
        design_fir_lpf,
        design_fir_resampler,
    )
    from iqwaveform_tpu.ops.resample_poly import upfirdn

    fs, fs_out = 61.44e6, 30.72e6
    _, fir_kw = design_fir_resampler(fs, fs_out)  # {'up': 1, 'down': 2}
    h = np.asarray(design_fir_lpf(20e6, fs, numtaps=4001))

    dt_conv = path(lambda v: upfirdn(h, v, backend='xla', **fir_kw))
    try:
        dt_pl = path(lambda v: upfirdn(h, v, backend='pallas', **fir_kw))
    except Exception as err:
        _log(f'upfirdn pallas unavailable: {err!r:.150}')
        dt_pl = float('inf')

    best = min(dt_conv, dt_pl)
    _log(
        f'upfirdn 100Ms: conv {n / dt_conv / 1e6:.0f} MS/s, pallas '
        f'{n / dt_pl / 1e6:.0f} MS/s'
    )
    extras = [('upfirdn_conv_100ms_1chip', n / dt_conv / 1e6, 'MS/s')]
    if np.isfinite(dt_pl):
        extras.append(
            ('upfirdn_pallas_100ms_1chip', n / dt_pl / 1e6, 'MS/s')
        )
    return 'upfirdn_polyphase_100ms_1chip', n / best / 1e6, extras


def _upfirdn_setup():
    """shared workload for the two upfirdn configs: a 100 Ms capture
    generated ON the device (H2D of 800 MB through the tunnel would
    dominate) and a 3-trial difference-timing closure."""
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.utils import unpack_iq

    n = 100_000_000
    key = jax.random.PRNGKey(0)
    ri = jax.jit(
        lambda k: jax.random.normal(k, (2, n), jnp.float32)
    )(key)

    def path(fn):
        step = jax.jit(lambda p: jnp.abs(fn(unpack_iq(p))) ** 2)
        return _measure(step, ri, trials=3)

    return n, path


def bench_upfirdn_routes():
    """companion to `upfirdn100ms` (see its docstring): the OLA
    frequency-domain route delivering the same lowpass+2:1 resample
    (design_cola_resampler defaults: nfft=16384 -> 8192, the monitor's
    path) and a fractional up=2/down=3 point on the conv path with
    lhs_dilation actually engaged."""
    n, path = _upfirdn_setup()
    from iqwaveform_tpu.ops.filtering import design_fir_lpf, ola_filter
    from iqwaveform_tpu.ops.resample_poly import upfirdn

    fs = 61.44e6
    h = np.asarray(design_fir_lpf(20e6, fs, numtaps=4001))

    dt_ola = path(
        lambda v: ola_filter(
            v, fs=fs, nfft=16384, window='hamming',
            passband=(-10e6, 10e6), nfft_out=8192,
        )
    )
    dt_frac = path(lambda v: upfirdn(h, v, up=2, down=3, backend='xla'))
    _log(
        f'upfirdn routes 100Ms: ola {n / dt_ola / 1e6:.0f} MS/s, '
        f'frac2/3 conv {n / dt_frac / 1e6:.0f} MS/s'
    )
    extras = [
        ('upfirdn_frac23_conv_100ms_1chip', n / dt_frac / 1e6, 'MS/s'),
    ]
    return 'upfirdn_ola_route_100ms_1chip', n / dt_ola / 1e6, extras


def bench_channelize64():
    """BASELINE config #4: batched 64-channel channelizer -> per-channel
    power series -> detector stats, 4 captures x 10 Ms per step.

    Routed through the fused single-pass Pallas kernel
    (fft_backend='pallas', trim-aware since round 3): the 4 captures
    are whole numbers of frames, so one flattened kernel call computes
    the identical per-row frame series (frames never span rows)."""
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.ops.spectral import channelize_power
    from iqwaveform_tpu.utils import unpack_iq

    B, n = 4, 10_000_000
    fft_per_chan, n_chan = 256, 64
    nperseg = fft_per_chan * n_chan
    n_use = (n // nperseg) * nperseg

    rng = np.random.default_rng(0)
    ri = jnp.asarray(
        np.stack(
            [rng.standard_normal((B, n_use)), rng.standard_normal((B, n_use))]
        ).astype('float32')
    )

    def step_body(planes):
        v = unpack_iq(planes)
        _, _, cp = channelize_power(
            v.reshape(-1), 1.0 / 122.88e6, fft_per_chan,
            analysis_bins_per_channel=int(fft_per_chan * 0.75),
            window='hamming', channel_count=n_chan, fft_backend='pallas',
        )  # cp: (B * time, channel)
        cp = cp.reshape(B, -1, n_chan)
        return jnp.stack(
            [cp.mean(axis=1), cp.max(axis=1),
             jnp.sqrt((cp * cp).mean(axis=1))],
            axis=1,
        )

    step = jax.jit(step_body)
    dt = _measure(step, ri)
    return 'channelize64_stats_1chip', B * n_use / dt / 1e6, []


def bench_disk_to_chip():
    """sustained disk->chip ingest-inclusive throughput (VERDICT r3 #3):
    runs examples/disk_to_chip.py (SigMF ci16 capture -> CapturePrefetcher
    -> H2D -> persistence+APD folds) and reports the end-to-end MS/s,
    plus the pipeline's component rates as extras so the binding stage
    is explicit. On the axon tunnel the H2D link (~18 MB/s measured)
    binds ~200x below the device fold rate — the number measures the
    tunnel, not the library (docs/BENCH_notes.md "Disk->chip
    sustained"); on local PCIe hardware the same pipeline is bound by
    min(disk, host deinterleave, H2D, compute)."""
    import re
    import subprocess

    import jax
    import jax.numpy as jnp

    out_dir = '/tmp/iqwaveform_d2c_bench'
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, EXAMPLE_ON_TPU='1')
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(here, 'examples', 'disk_to_chip.py'),
            '--gigasamples', '0.05', '--out-dir', out_dir,
        ],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    sys.stderr.write(res.stderr[-1000:])
    m = re.search(r'sustained (\d+(?:\.\d+)?) MS/s', res.stdout)
    if res.returncode != 0 or not m:
        raise RuntimeError(
            f'disk_to_chip failed rc={res.returncode}: {res.stdout[-500:]!r}'
        )
    msps = float(m.group(1))

    # component rate 1: tunnel H2D bandwidth (one 134 MB f32 transfer)
    x = np.random.default_rng(0).standard_normal((2, 1 << 24)).astype(
        'float32'
    )
    f = jax.jit(lambda v: v.sum(keepdims=True))
    np.asarray(f(jnp.ones((8, 8), jnp.float32)))  # init + warm
    t0 = time.perf_counter()
    np.asarray(f(jnp.asarray(x)))
    h2d_mbps = x.nbytes / (time.perf_counter() - t0) / 1e6

    # component rate 2: prefetcher disk -> host f32 planes (no device)
    from iqwaveform_tpu import io as iqio

    path = os.path.join(out_dir, 'capture.sigmf-data')
    t0 = time.perf_counter()
    done = 0
    for _ in range(3):  # the 0.05 GS file is short; steady the estimate
        with iqio.CapturePrefetcher(
            path, 2**24, 'ci16_le', planes=True
        ) as ch:
            for planes in ch:
                float(planes[0][0])
                done += 1
    disk_msps = done * 2**24 / (time.perf_counter() - t0) / 1e6

    extras = [
        ('disk_to_chip_h2d_tunnel', h2d_mbps, 'MB/s'),
        ('disk_to_host_prefetcher', disk_msps, 'MS/s'),
    ]
    return 'disk_to_chip_sustained_1chip', msps, extras


CONFIGS = {
    'disk2chip': bench_disk_to_chip,
    'monitor8192p': lambda: bench_monitor(8192, ola_kernel='pallas', fft_precision='high', apd_kernel='pallas', chan_kernel='pallas'),
    'monitor_default': bench_monitor_default,
    # opt-in bf16 frame-storage tier (~4e-3 rel; see MonitorDesign)
    'monitor8192bf16': lambda: bench_monitor(8192, ola_kernel='pallas', fft_precision='bf16', apd_kernel='pallas', chan_kernel='pallas'),
    'monitor8192i16': bench_monitor_i16,
    'monitor8192': lambda: bench_monitor(8192),
    'monitor2048': lambda: bench_monitor(2048),
    'spectrogram': bench_spectrogram,
    'monitorRx4': lambda: bench_monitor_rx(4),
    'streaming1gs': bench_streaming,
    'channelize64': bench_channelize64,
    'psd': bench_psd,
    'upfirdn100ms': bench_upfirdn,
    'upfirdn_routes100ms': bench_upfirdn_routes,
}


def run_config(name: str):
    out = CONFIGS[name]()
    metric, msps, extras = out if len(out) == 3 else (*out, [])
    print(
        json.dumps(
            {
                'metric': metric,
                'value': round(msps, 1),
                'unit': 'MS/s',
                'vs_baseline': round(msps / PER_CHIP_TARGET_MSPS, 3),
            }
        )
    )
    for em, ev, eu in extras:
        print(json.dumps({'metric': em, 'value': round(ev, 1), 'unit': eu}))


# budgets sized for a cold tunnel session: client init alone can
# reach ~8 min when recent clients died holding chip grants, and
# remote compiles take 2-4 min per config.
# ordered most-important-first so a session cut short still refreshes
# the headline configs; results merge into docs/BENCH_matrix.json after
# every config, so a cut-short session never deletes other metrics
# (ADVICE r4: a partial session must not truncate the canonical record)
MATRIX_BUDGETS = {
    'monitor8192p': 1800, 'streaming1gs': 1600, 'monitor_default': 1500,
    'psd': 1800, 'spectrogram': 1200, 'channelize64': 1500,
    'upfirdn100ms': 1800, 'upfirdn_routes100ms': 1800,
    'monitorRx4': 1500, 'monitor8192bf16': 1500,
    'monitor8192i16': 1500, 'monitor8192': 1500, 'disk2chip': 1800,
}

# cross-session spread window (VERDICT r4 #2): matrix rows report the
# median over the most recent HISTORY_WINDOW sessions of each metric,
# plus n_sessions and spread_pct, so single-session tunnel jitter
# (~10%) is visible instead of baked into a lone number
HISTORY_WINDOW = 5

_DOCS = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'docs')
MATRIX_PATH = os.path.join(_DOCS, 'BENCH_matrix.json')
HISTORY_PATH = os.path.join(_DOCS, 'BENCH_history.json')


def _load_json(path, default):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return default


def _merged_rows(history):
    """render the per-metric history into matrix rows: median over the
    last HISTORY_WINDOW sessions + spread. Row order follows the history
    file (insertion order = first-measured order)."""
    rows = []
    for metric, entries in history.items():
        if metric.startswith('_') or not entries:
            continue
        window = entries[-HISTORY_WINDOW:]
        values = sorted(e['value'] for e in window)
        median = float(np.median(values))
        latest = window[-1]
        row = {
            'metric': metric,
            'value': round(median, 1),
            'unit': latest['unit'],
        }
        if any('vs_baseline' in e for e in window):
            row['vs_baseline'] = round(median / PER_CHIP_TARGET_MSPS, 3)
        row['n_sessions'] = len(window)
        if len(window) > 1 and median:
            row['spread_pct'] = round(
                100.0 * (values[-1] - values[0]) / abs(median), 1
            )
        rows.append(row)
    return rows


def _record_session(history, session: str, rows):
    for row in rows:
        entry = {k: row[k] for k in ('value', 'unit') if k in row}
        if 'vs_baseline' in row:
            entry['vs_baseline'] = row['vs_baseline']
        entry['session'] = session
        history.setdefault(row['metric'], []).append(entry)


def _write_matrix(history, session, failed):
    """persist history + the merged matrix; failed configs are recorded
    per session under history['_failures'] (visible, never silent)."""
    out = dict(history)
    if failed:
        failures = [
            e for e in out.get('_failures', []) if e.get('session') != session
        ]
        failures.append({'session': session, 'configs': dict(failed)})
        out['_failures'] = failures
    with open(HISTORY_PATH, 'w') as f:
        json.dump(out, f, indent=1)
    with open(MATRIX_PATH, 'w') as f:
        json.dump(_merged_rows(history), f, indent=1)


def run_matrix(config_names=None, session: str = None):
    """run benchmark configs in their own subprocesses; merge results
    by metric into docs/BENCH_matrix.json (median + spread over the
    last HISTORY_WINDOW sessions, kept in docs/BENCH_history.json).

    ``config_names`` restricts the run (comma list from the CLI) so
    spread sessions can re-measure only the headline metrics without
    paying for the full matrix. Configs that fail are recorded under
    history['_failures'] and logged loudly — never silently dropped.
    """
    if session is None:
        session = time.strftime('%Y%m%d-%H%M%S')
    budgets = {
        k: v for k, v in MATRIX_BUDGETS.items()
        if config_names is None or k in config_names
    }
    unknown = set(config_names or ()) - set(MATRIX_BUDGETS)
    if unknown:
        raise SystemExit(f'unknown matrix configs: {sorted(unknown)}')

    history = _load_json(HISTORY_PATH, {})
    # seed history from a pre-history matrix file so legacy single-value
    # rows survive the migration as 1-session entries
    legacy = _load_json(MATRIX_PATH, [])
    for row in legacy:
        if row.get('metric') not in history:
            _record_session(
                history, row.get('session', 'legacy-matrix'), [row]
            )

    failed = []
    for name, budget in budgets.items():
        _log(f'bench matrix: {name} (budget {budget}s)')
        try:
            result = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                timeout=budget, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            _log(f'bench matrix: {name} TIMEOUT')
            failed.append((name, 'timeout'))
            continue
        sys.stderr.write(result.stderr[-2000:])
        if result.returncode == 0:
            rows = [
                json.loads(ln)
                for ln in result.stdout.strip().splitlines()
            ]
            for ln in result.stdout.strip().splitlines():
                print(ln, flush=True)
            _record_session(history, session, rows)
        else:
            _log(f'bench matrix: {name} rc={result.returncode}')
            failed.append((name, f'rc={result.returncode}'))

        _write_matrix(history, session, failed)

    _write_matrix(history, session, failed)
    _log(f'bench matrix: wrote {MATRIX_PATH} (+history {HISTORY_PATH})')
    if failed:
        _log(f'bench matrix: FAILED configs this session: {failed}')
        sys.exit(2)


def main():
    # matrix mode: run and record benchmark configurations; an optional
    # comma list restricts to a subset (spread re-measurement sessions):
    #   python bench.py --matrix
    #   python bench.py --matrix monitor8192p,streaming1gs,psd
    if len(sys.argv) > 1 and sys.argv[1] == '--matrix':
        names = sys.argv[2].split(',') if len(sys.argv) > 2 else None
        run_matrix(names)
        return

    # child mode: run one configuration in-process
    if len(sys.argv) > 1:
        run_config(sys.argv[1])
        return

    # parent mode: try configurations in killable subprocesses (native
    # hangs in the TPU tunnel are immune to SIGALRM)
    # budgets include tunnel client-init, which degrades to ~5 min when
    # recent clients died holding chip grants
    attempts = [
        ('monitor8192p', 1800),
        ('monitor8192', 900),
        ('monitor2048', 700),
        ('spectrogram', 600),
    ]

    for name, budget in attempts:
        _log(f'bench: trying {name} (budget {budget}s)')
        try:
            result = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                timeout=budget,
                capture_output=True,
                text=True,
            )
        except subprocess.TimeoutExpired:
            _log(f'bench: {name} timed out; falling back')
            continue

        sys.stderr.write(result.stderr)
        if result.returncode == 0 and result.stdout.strip():
            # first line is the config's headline metric (extras follow)
            line = json.loads(result.stdout.strip().splitlines()[0])
            if name != attempts[0][0]:
                # make a degraded-config result impossible to mistake for
                # the flagship number
                line['fallback_from'] = attempts[0][0]
            print(json.dumps(line))
            return
        _log(f'bench: {name} failed (rc={result.returncode}); falling back')

    print(
        json.dumps(
            {
                'metric': 'bench_unavailable_backend_error',
                'value': 0.0,
                'unit': 'MS/s',
                'vs_baseline': 0.0,
            }
        )
    )
    sys.exit(1)


if __name__ == '__main__':
    main()
