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

    apd_bins = 2048
    lo, hi = -120.0, 30.0
    edges_pow = (10 ** (np.linspace(lo, hi, apd_bins) / 10.0)).astype(
        'float32'
    )
    w = (hi - lo) / (apd_bins - 1)
    rng = np.random.default_rng(0)

    def make_packed(slab):
        @jax.jit
        def packed(p):
            v = 10.0 * jnp.log10(p)
            idx = jnp.clip(jnp.ceil((v - lo) / w), 0, apd_bins).astype(
                jnp.int32
            )
            counts2d = columnwise_histogram_packed(
                levels=(idx.reshape(-1, 128), apd_bins + 1), slab_size=slab
            )
            return counts2d.sum(axis=0).astype(jnp.float32)

        return packed

    def make_packed_raw(slab):
        # the round-4 monitor pattern: raw tiles + fused diagonal-trace
        # column-sum readout (no strided diagonal gather)
        from iqwaveform_tpu.ops.pallas.colhist_pallas import (
            columnwise_histogram_packed_raw,
            packed_plan,
            unpack_packed_counts_total,
        )

        plan = packed_plan(apd_bins + 1, 128, slab)

        @jax.jit
        def packed(p):
            v = 10.0 * jnp.log10(p)
            idx = jnp.clip(jnp.ceil((v - lo) / w), 0, apd_bins).astype(
                jnp.int32
            )
            raw = columnwise_histogram_packed_raw(
                levels=(idx.reshape(-1, 128), apd_bins + 1), plan=plan
            )
            return unpack_packed_counts_total(raw, plan).astype(jnp.float32)

        return packed

    @jax.jit
    def edge(p):
        return histogram_edge_counts_pallas(p, edges_pow).astype(jnp.float32)

    # both operating points: navg=1 (8.4M samples) and the flagship's
    # navg=16 (0.5M binned samples)
    for n in (1 << 23, 1 << 19):
        p = jnp.asarray((rng.standard_normal(n) ** 2).astype('float32'))
        cases = (
            [('edge-compare', edge)]
            + [(f'packed slab{s}', make_packed(s)) for s in (None, 8)]
            + [(f'packed-raw slab{s}', make_packed_raw(s)) for s in (None, 8)]
        )
        for name, fn in cases:
            dt, _ = measure(fn, p)
            total = float(np.asarray(fn(p)).sum())
            print(
                f'apd n={n >> 20:2d}M {name:16s} {dt * 1e3:7.2f} ms '
                f'({n / dt / 1e9:5.2f} GS/s) total={total:.0f}',
                flush=True,
            )


def main():
    import jax

    print('devices:', jax.devices(), flush=True)
    probe_apd()


if __name__ == '__main__':
    sys.exit(main())
