"""Stage attribution for the monitor bench pipeline on the real chip.

Times nested prefixes of the monitor step (unpack -> OLA resample ->
channelizer+stats -> +APD); consecutive differences attribute per-stage
cost. Uses the same fencing/difference-timing discipline as bench.py
(axon's block_until_ready returns at dispatch; only an f32 readback
fences).

Run: python scripts/profile_stages.py   (claims the TPU chip)
"""

import sys

import numpy as np

from _timing import fence_vec as _fence_vec, measure


def main():
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor
    from iqwaveform_tpu.utils import unpack_iq

    precision = sys.argv[1] if len(sys.argv) > 1 else 'highest'
    ola_kernel = sys.argv[2] if len(sys.argv) > 2 else 'matmul'
    apd_kernel = sys.argv[3] if len(sys.argv) > 3 else 'sort'
    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6,
        channel_count=16, fft_size_per_channel=256, window='hamming',
        apd_bins=2048, apd_navg=16, fft_backend='mxu', min_fft_size=8191,
        fft_precision=precision, ola_kernel=ola_kernel, apd_kernel=apd_kernel,
    )
    mon = WidebandMonitor(design)
    print(f'nfft={design.nfft}->{design.nfft_out}', file=sys.stderr)

    quantum = mon.min_input_multiple()
    n = int(np.ceil(2**24 / quantum)) * quantum
    rng = np.random.default_rng(0)
    ri = jnp.asarray(
        np.stack([rng.standard_normal(n), rng.standard_normal(n)]).astype('float32')
    )

    from iqwaveform_tpu.parallel.sharded import _sharded_ola_body

    def ola_only(planes):
        x = unpack_iq(planes)
        y = _sharded_ola_body(
            x, w_in=mon._w_in, w_shift_out=mon._w_shift_out,
            nfft=design.nfft, nfft_out=design.nfft_out,
            noverlap_in=mon.noverlap_in, noverlap_out=mon.noverlap_out,
            bounds_in=mon._bounds_in, bounds_out=mon._bounds_out,
            zero_lo=mon._zero_lo, zero_hi=mon._zero_hi,
            axis_name=None, fft_fn=mon._fft, ifft_fn=mon._ifft,
            fused_fn=mon._fused_ola, fused_raw_fn=mon._fused_ola_raw,
        )
        return _fence_vec(y * y.conj())

    def chan_stats(planes):
        x = unpack_iq(planes)
        out = mon._body_1d(x, None)
        # touch every output so nothing is dead-code-eliminated
        total = (
            out['psd_mean'].sum()
            + out['psd_max'].sum()
            + out['channel_power_mean'].sum()
            + out['channel_power_max'].sum()
            + out['apd_counts'].astype('float32').sum()
            + out['channel_power'].sum()
        )
        return _fence_vec(total)

    def no_apd(planes):
        x = unpack_iq(planes)
        y = _sharded_ola_body(
            x, w_in=mon._w_in, w_shift_out=mon._w_shift_out,
            nfft=design.nfft, nfft_out=design.nfft_out,
            noverlap_in=mon.noverlap_in, noverlap_out=mon.noverlap_out,
            bounds_in=mon._bounds_in, bounds_out=mon._bounds_out,
            zero_lo=mon._zero_lo, zero_hi=mon._zero_hi,
            axis_name=None, fft_fn=mon._fft, ifft_fn=mon._ifft,
            fused_fn=mon._fused_ola, fused_raw_fn=mon._fused_ola_raw,
        )
        nfft_big = mon._nfft_big
        n_frames = y.shape[0] // nfft_big
        frames = y[: n_frames * nfft_big].reshape(n_frames, nfft_big)
        wind = (mon._w_ch / nfft_big).astype(frames.dtype)
        Y = mon._fft(frames * wind[None, :], axis=1)
        spg = Y.real * Y.real + Y.imag * Y.imag
        ch = spg.reshape(n_frames, design.channel_count, -1).sum(axis=2)
        psd_dB = 10.0 * jnp.log10(spg + 1e-25)
        return _fence_vec(psd_dB.mean(axis=0) + ch.mean(axis=0).sum())

    def unpack_only(planes):
        x = unpack_iq(planes)
        return _fence_vec(x)

    stages = [
        ('unpack', unpack_only),
        ('ola', ola_only),
        ('no_apd', no_apd),
        ('full', chan_stats),
    ]
    times = {}
    for name, fn in stages:
        dt, tc = measure(jax.jit(fn), ri)
        times[name] = dt
        print(
            f'{name:8s} {dt * 1e3:8.2f} ms  ({n / dt / 1e6:7.1f} MS/s)'
            f'  [compile {tc:.1f}s]',
            flush=True,
        )

    print('--- attribution (consecutive differences) ---')
    print(f'h2d+unpack+reduce : {times["unpack"] * 1e3:8.2f} ms')
    print(f'ola resample      : {(times["ola"] - times["unpack"]) * 1e3:8.2f} ms')
    print(f'chan stft + stats : {(times["no_apd"] - times["ola"]) * 1e3:8.2f} ms')
    print(f'apd histogram     : {(times["full"] - times["no_apd"]) * 1e3:8.2f} ms')


if __name__ == '__main__':
    main()
