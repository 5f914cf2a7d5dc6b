"""frames_per_block sweep for the overlap-add-fused strided OLA kernel
plus the end-to-end flagship monitor step at the winning block size.

Run: python scripts/probe_ola_sweep.py   (claims the TPU chip)
"""

import sys

import numpy as np

from _timing import fence_vec as _fence_vec, measure


def main():
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor
    from iqwaveform_tpu.utils import unpack_iq

    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6,
        channel_count=16, fft_size_per_channel=256, window='hamming',
        apd_bins=2048, apd_navg=16, fft_backend='mxu',
        min_fft_size=8191,
        fft_precision='high', ola_kernel='pallas', apd_kernel='pallas',
        chan_kernel='pallas',
    )
    mon = WidebandMonitor(design)
    hop_in = mon.hop_in
    n = 2**24
    M = n // hop_in
    print(f'nfft={design.nfft}->{design.nfft_out} hop={hop_in} M={M}',
          file=sys.stderr)

    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.standard_normal((2, n)).astype('float32'))
    halo = jnp.zeros((2, hop_in), jnp.float32)

    def make_step(fpb):
        def step(planes_):
            y, tail = mon._strided_ola(
                planes_, halo, n_frames=M, precision='high',
                frames_per_block=fpb,
            )
            return _fence_vec(y.sum() + tail.sum())

        return jax.jit(step)

    for fpb in (4, 8, 16, 32):
        dt, tc = measure(make_step(fpb), planes, trials=5)
        print(
            f'strided T={fpb:<3d} {dt * 1e3:8.2f} ms '
            f'({n / dt / 1e6:7.1f} MS/s)  [compile {tc:.1f}s]',
            flush=True,
        )

    # full flagship monitor step (bench.py monitor8192p equivalent)
    quantum = mon.min_input_multiple()
    nm = int(np.ceil(2**24 / quantum)) * quantum
    ri = jnp.asarray(
        np.stack(
            [rng.standard_normal(nm), rng.standard_normal(nm)]
        ).astype('float32')
    )
    step = jax.jit(lambda p: _fence_vec(
        mon.step(unpack_iq(p))['psd_mean'].sum()
    ))
    dt, tc = measure(step, ri, trials=5)
    print(
        f'monitor step    {dt * 1e3:8.2f} ms ({nm / dt / 1e6:7.1f} MS/s)'
        f'  [compile {tc:.1f}s]',
        flush=True,
    )


if __name__ == '__main__':
    main()
