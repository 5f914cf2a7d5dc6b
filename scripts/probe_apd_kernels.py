"""On-chip probe: APD histogram kernels by sample count (round 3).

At navg=1 scale (8.4M samples, 2048 edges) the edge-compare kernel
does O(B) compares per sample while the factored packed counter does
O(2*sqrt(B)) one-hot cells — this probe measured 13.37 vs 2.15 ms
(6.2x), the basis for MonitorDesign's apd_kernel='packed' guidance.
At the flagship's navg=16 (0.5M binned samples) the packed counter's
fixed quadrant-dot + readout overhead dominates and edge-compare wins
(docs/BENCH_notes.md "APD kernel choice by sample count").

Run: python scripts/probe_apd_kernels.py   (claims the TPU chip)
"""

import sys

import numpy as np

from _timing import measure


def probe_apd():
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.ops.pallas.colhist_pallas import (
        columnwise_histogram_packed,
    )
    from iqwaveform_tpu.ops.pallas.hist_pallas import (
        histogram_edge_counts_pallas,
    )

    n = 1 << 23  # 8.4M samples (the flagship resampled stream, navg=1)
    apd_bins = 2048
    lo, hi = -120.0, 30.0
    edges_pow = (10 ** (np.linspace(lo, hi, apd_bins) / 10.0)).astype(
        'float32'
    )
    rng = np.random.default_rng(0)
    p_host = (rng.standard_normal(n) ** 2).astype('float32')
    p = jnp.asarray(p_host)

    @jax.jit
    def edge(p):
        return histogram_edge_counts_pallas(p, edges_pow).astype(jnp.float32)

    w = (hi - lo) / (apd_bins - 1)

    @jax.jit
    def packed(p):
        v = 10.0 * jnp.log10(p)
        idx = jnp.clip(jnp.ceil((v - lo) / w), 0, apd_bins).astype(jnp.int32)
        counts2d = columnwise_histogram_packed(
            levels=(idx.reshape(-1, 128), apd_bins + 1)
        )
        return counts2d.sum(axis=0).astype(jnp.float32)

    for name, fn in [('edge-compare', edge), ('packed slab', packed)]:
        dt, _ = measure(fn, p)
        total = float(np.asarray(fn(p)).sum())
        print(
            f'apd {name:14s} {dt * 1e3:7.2f} ms  ({n / dt / 1e9:.2f} GS/s) '
            f'total={total:.0f}',
            flush=True,
        )


def main():
    import jax

    print('devices:', jax.devices(), flush=True)
    probe_apd()


if __name__ == '__main__':
    sys.exit(main())
