"""Decompose the flagship strided-OLA kernel's cost by precision tier.

The kernel (ops/pallas/fused_ola_pallas.py) runs four complex matmul
stages; per stage the tiers cost:

  'default' : Gauss 3 dots x 1-pass bf16  =  3 MXU passes, no splits
  'high'    : Gauss 3 dots x 3-pass hi/lo =  9 passes + per-dot splits
  'highest' : plain 4 dots x 6-pass       = 24 passes (Mosaic splits)

With t(p) = F + P*passes (+ split cost S at 'high'), the three timings
bound how much of the 'high' tier is MXU passes vs fixed elementwise
work (twiddles, framing slices, VMEM copies, IO) — which decides
whether ROADMAP item "flagship OLA ~70% of step" is attacked through
pass count or through the elementwise chain.

Run: python scripts/probe_ola_tiers.py   (claims the TPU chip)
"""

import sys

import numpy as np

from _timing import fence_vec as _fence_vec, measure


def main():
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor

    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6,
        channel_count=16, fft_size_per_channel=256, window='hamming',
        apd_bins=2048, apd_navg=16, fft_backend='mxu',
        min_fft_size=8191,
        fft_precision='high', ola_kernel='pallas', apd_kernel='pallas',
        chan_kernel='pallas',
    )
    mon = WidebandMonitor(design)
    assert mon._strided_ola is not None
    hop_in = mon.hop_in
    n = 2**24
    M = n // hop_in
    print(f'nfft={design.nfft}->{design.nfft_out} hop={hop_in} M={M}',
          file=sys.stderr)

    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.standard_normal((2, n)).astype('float32'))
    halo = jnp.zeros((2, hop_in), jnp.float32)

    def make_step(tier, fpb=8):
        def step(planes_):
            y, tail = mon._strided_ola(
                planes_, halo, n_frames=M, precision=tier,
                frames_per_block=fpb,
            )
            return _fence_vec(y.sum() + tail.sum())

        return jax.jit(step)

    cases = [
        ('default_1pass', 'default', 8),
        ('high_3pass', 'high', 8),
        ('highest_6pass', 'highest', 8),
        ('high_T4', 'high', 4),
        ('high_T16', 'high', 16),
    ]
    times = {}
    for name, tier, fpb in cases:
        dt, tc = measure(make_step(tier, fpb), planes)
        times[name] = dt
        print(
            f'{name:14s} {dt * 1e3:8.2f} ms  ({n / dt / 1e6:7.1f} MS/s)'
            f'  [compile {tc:.1f}s]',
            flush=True,
        )

    t1, t3, t6 = (times[k] for k in ('default_1pass', 'high_3pass',
                                     'highest_6pass'))
    # per stage: 3 / 9 / 24 passes -> per-chunk-pass slope from the two
    # non-split tiers' gap is confounded by Mosaic's own HIGHEST split
    # cost; the clean numbers are the 'high' tier's breakdown bounds
    print('--- decomposition (per 2^24-sample call) ---')
    print(f'fixed+3-pass floor (t1)      : {t1 * 1e3:7.2f} ms')
    print(f'6 extra passes + splits (t3-t1): {(t3 - t1) * 1e3:7.2f} ms')
    print(f'highest vs high (t6-t3)      : {(t6 - t3) * 1e3:7.2f} ms')
    slope = (t6 - t3) / 15  # 15 extra passes/stage, Mosaic-split form
    print(f'per-pass slope from (t6-t3)/15 : {slope * 1e3:7.3f} ms')
    print(f'pass share of t3 at that slope : {9 * slope / t3 * 100:5.1f}%')


if __name__ == '__main__':
    main()
