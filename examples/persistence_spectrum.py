"""Example: streaming persistence spectrum with checkpoint/resume.

Builds a persistence spectrum (per-frequency histogram + quantiles +
envelope statistics) of a long capture at fixed memory using the
parallel.streaming primitives — the configuration bench.py's 1 GS
streaming benchmark measures (design-dict -> fold -> finalize, with
the factored-order MXU transform on TPU targets). Demonstrates:

- streaming_persistence_spectrum with fft_backend='mxu'
- interrupt/resume via the result's '_carry' + save_carry/load_carry
- detector-binned APD counts via streaming_apd(navg=...)

Run: python examples/persistence_spectrum.py [out_dir]
(CPU by default; on a TPU host the same code runs on the chip.)
"""

import os
import sys
import tempfile

import jax

if not os.environ.get('EXAMPLE_ON_TPU'):
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from iqwaveform_tpu.parallel import (
    ccdf_from_counts,
    streaming_apd,
    streaming_persistence_spectrum,
)
from iqwaveform_tpu.parallel.streaming import load_carry, save_carry


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    os.makedirs(out_dir, exist_ok=True)

    fs = 7.68e6
    nfft = 512
    rng = np.random.default_rng(0)

    # a bursty carrier: tone present in half the frames (a persistence
    # spectrum separates the always-on noise floor from the burst)
    n = nfft * 512
    t = np.arange(n) / fs
    tone = 0.5 * np.exp(2j * np.pi * 1.2e6 * t)
    gate = (np.arange(n) // (nfft * 8)) % 2  # on/off every 8 frames
    x = (
        gate * tone
        + 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    ).astype('complex64')

    kw = dict(
        fs=fs, window='hann', nfft=nfft, chunk_frames=64,
        hist_bins=512, quantiles=(0.5, 0.95), fft_backend='mxu',
    )

    # process the first half, checkpoint, then resume with the rest —
    # the pattern for multi-day captures that outlive a process
    half = n // 2
    r1 = streaming_persistence_spectrum(jnp.asarray(x[:half]), **kw)
    ckpt = os.path.join(out_dir, 'persistence_carry.npz')
    save_carry(ckpt, r1['_carry'])

    restored = load_carry(ckpt, r1['_carry'])
    res = streaming_persistence_spectrum(
        jnp.asarray(x[half:]), init_carry=restored, **kw
    )

    med, p95 = np.asarray(res['quantiles_dB'])
    fbin = np.argmin(np.abs(res['freqs'] - 1.2e6))
    print(f"median dB at tone bin: {med[fbin]:.1f}")
    print(f"p95 dB at tone bin:    {p95[fbin]:.1f}")
    # the burst is visible in p95 but suppressed in the median
    assert p95[fbin] > med[fbin] + 3.0

    # detector-binned APD of the same capture (reference CCDF workflow)
    p = np.abs(x) ** 2
    edges = np.linspace(0, float(p.max()), 128).astype('float32')
    counts = streaming_apd(
        jnp.asarray(x), edges=edges, chunk_size=nfft * 64, navg=16
    )
    ccdf = np.asarray(ccdf_from_counts(counts, int(np.asarray(counts).sum())))
    print(f"APD: P(power > {edges[64]:.3f}) = {ccdf[64]:.3f}")

    print('persistence_spectrum done')


if __name__ == '__main__':
    main()
