"""Example: end-to-end wideband monitoring of a synthetic capture.

Synthesizes a multi-carrier capture, runs the WidebandMonitor pipeline
(OLA bandpass + 2:1 resample -> 16-channel channelizer -> persistence
statistics -> APD), and renders the standard analysis figures.

Run: python examples/wideband_monitor.py [out_dir]
(CPU by default; on a TPU host the same code runs on the chip.)
"""

import sys

import matplotlib

matplotlib.use('Agg')

import os

import jax

# demo on CPU unless explicitly pointed at TPU hardware
if not os.environ.get('EXAMPLE_ON_TPU'):
    jax.config.update('jax_platforms', 'cpu')
import matplotlib.pyplot as plt
import numpy as np

import iqwaveform_tpu as iw
from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor


def synthesize_capture(fs, n, seed=0):
    """a few carriers of different widths + noise floor."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    x = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))

    for f_c, bw, amp in [(-15e6, 5e6, 1.0), (2e6, 1e6, 0.3), (18e6, 10e6, 0.6)]:
        # band-limited noise carrier: filtered white noise heterodyned to f_c
        base = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        nfft = 4096
        spec = np.fft.fft(base.reshape(-1, nfft), axis=1)
        freqs = np.fft.fftfreq(nfft, 1 / fs)
        spec[:, np.abs(freqs) > bw / 2] = 0
        carrier = np.fft.ifft(spec, axis=1).reshape(-1)
        x += amp * carrier * np.exp(2j * np.pi * f_c * t)

    return x.astype('complex64')


def main(out_dir='.'):
    fs = 61.44e6
    design = design_wideband_monitor(
        fs,
        30.72e6,
        bw=24e6,
        fs_sdr=fs,
        channel_count=16,
        fft_size_per_channel=256,
        window='hamming',
        apd_bins=1024,
        min_fft_size=2047,
    )
    mon = WidebandMonitor(design)

    n = mon.min_input_multiple() * 64
    print(f'synthesizing {n / 1e6:.1f} Ms capture at {fs / 1e6:.2f} MS/s ...')
    x = synthesize_capture(fs, n)

    print('running monitor pipeline ...')
    out = jax.jit(mon.step)(x)

    # --- figures ---
    fig, axs = plt.subplots(2, 2, figsize=(11, 7))

    ch_power = np.asarray(out['channel_power'])
    axs[0, 0].imshow(
        10 * np.log10(ch_power + 1e-25).T,
        aspect='auto',
        origin='lower',
        cmap='magma',
        interpolation='nearest',
    )
    axs[0, 0].set_title('Channel power vs time (dB)')
    axs[0, 0].set_xlabel('frame')
    axs[0, 0].set_ylabel('channel')

    freqs = iw.fftfreq(design.fft_size_per_channel * design.channel_count,
                       1 / design.fs_out) / 1e6
    axs[0, 1].plot(freqs, np.asarray(out['psd_mean']), label='mean')
    axs[0, 1].plot(freqs, np.asarray(out['psd_max']), label='max', alpha=0.6)
    axs[0, 1].set_title('Persistence spectrum (dB)')
    axs[0, 1].set_xlabel('frequency (MHz)')
    axs[0, 1].legend()

    counts = np.asarray(out['apd_counts'])[:-1]
    edges = mon.apd_edges_dB
    ccdf = 1 - counts.cumsum() / counts.sum()
    axs[1, 0].semilogy(edges, np.maximum(ccdf, 1e-9))
    axs[1, 0].set_title('APD / CCDF')
    axs[1, 0].set_xlabel('power (dB)')
    axs[1, 0].set_ylabel('P(power > x)')
    axs[1, 0].set_ylim(1e-7, 1)

    axs[1, 1].bar(
        np.arange(design.channel_count),
        10 * np.log10(np.asarray(out['channel_power_mean']) + 1e-25),
    )
    axs[1, 1].set_title('Mean channel power (dB)')
    axs[1, 1].set_xlabel('channel')

    fig.tight_layout()
    os.makedirs(out_dir, exist_ok=True)
    path = f'{out_dir}/wideband_monitor.png'
    fig.savefig(path, dpi=110)
    print('wrote', path)


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '.')
