"""Benchmark: wideband-monitor pipeline throughput on one TPU chip.

Measures the flagship end-to-end path (BASELINE.json configs #2/#4/#5,
single chip): OLA bandpass + 2:1 rational resample -> channelizer STFT ->
spectrogram statistics -> APD histogram, one jit program, complex64.

Prints ONE JSON line:
  {"metric": ..., "value": MS/s, "unit": "MS/s", "vs_baseline": ...}

vs_baseline normalizes against the BASELINE.json north star expressed per
chip: 50x real time on a 122.88 MS/s capture across v5e-8 = 768 MS/s/chip.
vs_baseline >= 1.0 means the single-chip target is met.
"""

import json
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)

PER_CHIP_TARGET_MSPS = 50 * 122.88 / 8  # = 768 MS/s per chip


def main():
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor

    # 122.88 -> 61.44 MS/s with a forced 2:1 OLA resample + 16-channel
    # analysis (configs #2 + #4 merged, single chip)
    design = design_wideband_monitor(
        122.88e6,
        61.44e6,
        bw=40e6,
        fs_sdr=122.88e6,
        channel_count=16,
        fft_size_per_channel=256,
        window='hamming',
        apd_bins=2048,
    )
    mon = WidebandMonitor(design)

    quantum = mon.min_input_multiple()
    n = int(np.ceil(2**24 / quantum)) * quantum  # ~16.8M samples (~134 MB)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype('complex64')
    x = jnp.asarray(x)

    step = jax.jit(mon.step)

    def run_and_fence(reps: int) -> float:
        """run `reps` steps and fence on a float32 readback of the last
        output. (On the tunneled axon platform block_until_ready returns at
        dispatch; a D2H readback of an f32 leaf is the only true fence.
        Execution is in-order, so the last output fences the whole queue.)
        """
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = step(x)
        np.asarray(out['psd_mean'])
        return time.perf_counter() - t0

    # compile + warmup
    _log(f'bench: compiling monitor step (n={n})...')
    t_compile = run_and_fence(1)
    _log(f'bench: compile+first step {t_compile:.1f}s')

    # difference timing cancels the fixed dispatch+roundtrip overhead
    reps_lo, reps_hi = 2, 12
    t_lo = run_and_fence(reps_lo)
    _log(f'bench: {reps_lo} reps {t_lo:.2f}s')
    t_hi = run_and_fence(reps_hi)
    _log(f'bench: {reps_hi} reps {t_hi:.2f}s')
    dt = (t_hi - t_lo) / (reps_hi - reps_lo)

    msps = n / dt / 1e6

    print(
        json.dumps(
            {
                'metric': 'monitor_pipeline_throughput_1chip',
                'value': round(msps, 1),
                'unit': 'MS/s',
                'vs_baseline': round(msps / PER_CHIP_TARGET_MSPS, 3),
            }
        )
    )


if __name__ == '__main__':
    main()
