"""Why is the rx-batched monitor slower per sample than one long row?

bench matrix: monitor8192p (1 x 16.8 Ms) 5183 MS/s vs monitorRx4
(4 x 4.2 Ms, vmapped) 3950 MS/s. Same math per sample; this probe
times the vmapped stage prefixes at rx in {1, 4} with the same total
sample count to attribute the gap (per-row kernel ramp/seam overheads
vs something else).

Run: python scripts/probe_rx_batch.py   (claims the TPU chip)
"""

import sys

import numpy as np

sys.path.insert(0, 'scripts')
from _timing import fence_vec as _fence_vec, measure  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor

    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6,
        channel_count=16, fft_size_per_channel=256, window='hamming',
        apd_bins=2048, apd_navg=16, fft_backend='mxu', min_fft_size=8191,
        fft_precision='high', ola_kernel='pallas', apd_kernel='pallas',
        chan_kernel='pallas',
    )
    mon = WidebandMonitor(design)
    quantum = mon.min_input_multiple()
    rng = np.random.default_rng(0)

    for rx in (1, 4):
        n_row = int(np.ceil(2**24 / rx / quantum)) * quantum
        n = rx * n_row
        ri = jnp.asarray(
            rng.standard_normal((2, rx, n_row)).astype('float32')
        )

        def resample_only(planes):
            y = jax.vmap(lambda p: mon._packed_resample(p, None))(
                jnp.moveaxis(planes, 1, 0)
            )
            return _fence_vec(y)

        def chan_stats(planes):
            def row(p):
                y = mon._packed_resample(p, None)
                cs = mon._chan_stats_packed(y)
                return (
                    cs['psd_log_sum'].sum()
                    + cs['psd_max'].sum()
                    + cs['channel_power'].sum()
                    + cs['p_binned'].sum()
                )

            return _fence_vec(jax.vmap(row)(jnp.moveaxis(planes, 1, 0)).sum())

        def full(planes):
            def row(p):
                out = mon._body_packed_planes(p, None)
                return (
                    out['psd_mean'].sum()
                    + out['psd_max'].sum()
                    + out['channel_power_mean'].sum()
                    + out['channel_power_max'].sum()
                    + out['apd_counts'].astype('float32').sum()
                )

            return _fence_vec(jax.vmap(row)(jnp.moveaxis(planes, 1, 0)).sum())

        times = {}
        for name, fn in [
            ('resample', resample_only), ('chan_stats', chan_stats),
            ('full', full),
        ]:
            dt, tc = measure(jax.jit(fn), ri)
            times[name] = dt
            print(
                f'rx={rx} {name:10s} {dt * 1e3:8.2f} ms '
                f'({n / dt / 1e6:7.1f} MS/s) [compile {tc:.1f}s]',
                flush=True,
            )
        print(
            f'rx={rx} attribution: resample {times["resample"] * 1e3:.2f} | '
            f'chan {(times["chan_stats"] - times["resample"]) * 1e3:.2f} | '
            f'apd {(times["full"] - times["chan_stats"]) * 1e3:.2f} ms',
            flush=True,
        )


if __name__ == '__main__':
    main()
