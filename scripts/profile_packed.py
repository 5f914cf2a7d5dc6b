"""Stage attribution for the fully-packed monitor pipeline (the
flagship bench config: ola/chan/apd all 'pallas', fft_precision
'high') on the real chip.

profile_stages.py profiles the unpacked composition; this script times
nested prefixes of the packed body (_packed_resample -> +chan_stats
-> +APD readout = full step) with the same difference-timing
discipline.

Run: python scripts/profile_packed.py   (claims the TPU chip)
"""

import sys

import numpy as np

from _timing import fence_vec as _fence_vec, measure


def main():
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor

    precision = sys.argv[1] if len(sys.argv) > 1 else 'high'
    # min_fft_size=8191 -> nfft 16384->8192, matching bench.py's flagship
    # monitor8192p config (pass 16383 as argv[2] for the 2x-FFT variant)
    min_fft_size = int(sys.argv[2]) if len(sys.argv) > 2 else 8191
    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6,
        channel_count=16, fft_size_per_channel=256, window='hamming',
        apd_bins=2048, apd_navg=16, fft_backend='mxu',
        min_fft_size=min_fft_size,
        fft_precision=precision, ola_kernel='pallas', apd_kernel='pallas',
        chan_kernel='pallas',
    )
    mon = WidebandMonitor(design)
    print(
        f'nfft={design.nfft}->{design.nfft_out} strided={mon._strided_ola is not None}'
        f' packed={mon._packed_ola is not None}',
        file=sys.stderr,
    )

    quantum = mon.min_input_multiple()
    n = int(np.ceil(2**24 / quantum)) * quantum
    rng = np.random.default_rng(0)
    ri = jnp.asarray(
        np.stack(
            [rng.standard_normal(n), rng.standard_normal(n)]
        ).astype('float32')
    )
    assert mon._packed_applies(n), 'packed path must arm for this shape'

    def resample_only(planes):
        y = mon._packed_resample(planes, None)
        return _fence_vec(y)

    def chan_stats(planes):
        y = mon._packed_resample(planes, None)
        cs = mon._chan_stats_packed(y)
        total = (
            cs['psd_log_sum'].sum()
            + cs['psd_max'].sum()
            + cs['channel_power'].sum()
            + cs['p_binned'].sum()
        )
        return _fence_vec(total)

    def full(planes):
        out = mon._body_packed_planes(planes, None)
        total = (
            out['psd_mean'].sum()
            + out['psd_max'].sum()
            + out['channel_power_mean'].sum()
            + out['channel_power_max'].sum()
            + out['apd_counts'].astype('float32').sum()
            + out['channel_power'].sum()
        )
        return _fence_vec(total)

    stages = [
        ('resample', resample_only),
        ('chan_stats', chan_stats),
        ('full', full),
    ]
    times = {}
    for name, fn in stages:
        dt, tc = measure(jax.jit(fn), ri)
        times[name] = dt
        print(
            f'{name:10s} {dt * 1e3:8.2f} ms  ({n / dt / 1e6:7.1f} MS/s)'
            f'  [compile {tc:.1f}s]',
            flush=True,
        )

    print('--- attribution (consecutive differences) ---')
    print(f'packed OLA resample : {times["resample"] * 1e3:8.2f} ms')
    print(
        f'chan stats kernel   : '
        f'{(times["chan_stats"] - times["resample"]) * 1e3:8.2f} ms'
    )
    print(
        f'apd hist + readout  : '
        f'{(times["full"] - times["chan_stats"]) * 1e3:8.2f} ms'
    )


if __name__ == '__main__':
    main()
