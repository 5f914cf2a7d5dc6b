"""On-chip microbench: packed columnwise histogram factor-dtype variants.

Compares int32 vs bfloat16 factor construction (the kernel's VPU
critical path — repeat + compare + cast of the one-hot factors) at the
streaming fold's production shape (16384 frames x 1024 freqs) x 1024
bins, plus the 256-bin monitor shape. Counts are oracle-checked against
the XLA sort path before timing.

Run: python scripts/bench_colhist.py   (claims the TPU chip)
"""

import numpy as np

from _timing import measure


def main():
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.ops.pallas.colhist_pallas import (
        columnwise_histogram_packed,
    )
    from iqwaveform_tpu.parallel.sharded import columnwise_histogram

    rng = np.random.default_rng(0)

    for (T, F, B) in [(16384, 1024, 1024), (16384, 1024, 256)]:
        edges = np.linspace(-120.0, 0.0, B + 1)
        vals_np = (
            rng.normal(-60, 18, size=(T, F)).astype('float32').clip(-119, -1)
        )
        vals = jnp.asarray(vals_np)

        oracle = None
        # int32 factors are unsupported by this Mosaic target ("Bad
        # lhs/rhs type" for i32 x i32 matmul) — only bf16 and int8 dots
        # compile; int8 re-tested under the slab-4 packing (VERDICT r3 #6)
        for factor_dtype, time_block in (
            (jnp.bfloat16, 128),
            (jnp.int8, 128),
            (jnp.int8, 256),
            (jnp.bfloat16, 256),
        ):
            name = (
                f'{T}x{F} B={B} factor={jnp.dtype(factor_dtype).name} '
                f'tb={time_block}'
            )

            @jax.jit
            def step(v, _fd=factor_dtype, _tb=time_block):
                c = columnwise_histogram_packed(
                    v, edges, factor_dtype=_fd, time_block=_tb
                )
                return c.astype(jnp.float32)

            counts = np.asarray(step(vals))
            if oracle is None:
                o = jax.jit(
                    lambda v: columnwise_histogram(v, edges).astype(
                        jnp.float32
                    )
                )
                oracle = np.asarray(o(vals))
            total_err = abs(counts.sum() - oracle.sum())
            cum_err = np.abs(
                np.cumsum(counts, 1) - np.cumsum(oracle, 1)
            ).max()
            dt, t_c = measure(step, vals)
            rate = T * F / dt / 1e9
            print(
                f'{name}: {dt * 1e3:7.2f} ms  {rate:6.2f} Gcell/s  '
                f'compile {t_c:5.1f} s  total_err={total_err:.0f} '
                f'cum_err<= {cum_err:.0f}',
                flush=True,
            )


if __name__ == '__main__':
    main()
