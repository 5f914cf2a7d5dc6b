"""Example: stream a long on-disk capture through the monitor at fixed
memory, with disk IO overlapped against compute.

Synthesizes a capture, persists it as a SigMF recording (ci16_le), then
streams it chunk by chunk: CapturePrefetcher loads + deinterleaves chunk
k+1 on a background thread (the native loader releases the GIL) while
chunk k folds into the running statistics via
WidebandMonitor.accumulate_step. Memory use is bounded by the chunk
size, not the capture length — the host-side counterpart of BASELINE
streaming config #3.

Run: python examples/streaming_capture.py [out_dir]
(CPU by default; on a TPU host the same code runs on the chip.)
"""

import os
import sys
import tempfile
import time

import jax

# demo on CPU unless explicitly pointed at TPU hardware
if not os.environ.get('EXAMPLE_ON_TPU'):
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from iqwaveform_tpu import io
from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor
from iqwaveform_tpu.utils import unpack_iq


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    os.makedirs(out_dir, exist_ok=True)

    fs = 7.68e6
    design = design_wideband_monitor(
        fs,
        fs / 2,
        bw=3e6,
        channel_count=8,
        fft_size_per_channel=64,
        window='hamming',
        apd_bins=256,
        apd_navg=4,
        min_fft_size=511,
        fs_sdr=fs,
    )
    mon = WidebandMonitor(design)

    chunk = mon.min_input_multiple() * 4
    n_chunks = 6
    n = chunk * n_chunks

    # synthesize: one carrier + noise, quantize to a SigMF ci16 recording
    rng = np.random.default_rng(0)
    t = np.arange(n) / fs
    x = 0.25 * np.exp(2j * np.pi * 0.9e6 * t) + 0.01 * (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    )
    data_path, meta_path = io.write_sigmf(
        os.path.join(out_dir, 'capture'),
        x.astype('complex64'),
        fs,
        datatype='ci16_le',
    )
    print(f'wrote {data_path} ({os.path.getsize(data_path) / 1e6:.1f} MB)')

    # stream: prefetch (2, chunk) float32 planes; fold chunks on device
    step = jax.jit(
        lambda carry, planes: mon.accumulate_step(carry, unpack_iq(planes))
    )
    carry = mon.init_carry(chunk)
    t0 = time.perf_counter()
    n_seen = 0
    with io.CapturePrefetcher(data_path, chunk, 'ci16_le', depth=2) as chunks:
        for planes in chunks:
            carry = step(carry, jnp.asarray(planes))
            n_seen += chunk
    out = jax.jit(mon.flush)(carry)
    psd_mean = np.asarray(out['psd_mean'])
    dt = time.perf_counter() - t0
    print(
        f'streamed {n_seen / 1e6:.2f} Ms in {dt:.2f}s '
        f'({n_seen / dt / 1e6:.1f} MS/s incl. disk)'
    )

    # the carrier at +0.9 MHz lands in channel 5 of 8 at fs_out=3.84 MS/s
    # (channels span [-1.92, 1.92) MHz in 0.48 MHz steps)
    ch_mean = np.asarray(out['channel_power_mean'])
    print('channel power (dB):', np.round(10 * np.log10(ch_mean), 1))
    print('strongest channel:', int(ch_mean.argmax()))
    assert np.isfinite(psd_mean).all()

    # one-shot oracle on the same capture: streaming must agree
    x_read = io.read_iq_data(data_path, 'ci16_le')
    one = jax.jit(mon.step)(jnp.asarray(x_read))
    delta = np.abs(
        np.asarray(one['channel_power_mean']) - ch_mean
    ).max() / ch_mean.max()
    print(f'streaming vs one-shot channel power: {delta:.2e} rel')
    assert delta < 1e-5

    print('streaming_capture done')


if __name__ == '__main__':
    main()
