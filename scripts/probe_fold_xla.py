"""On-chip A/B: fused_ola_mxu fold=True vs fold=False at flagship shapes.

The round-3 mask fold removed one einsum + one HBM round trip from the
XLA path, but the monitor8192 config regressed 2017 -> 1816 MS/s in the
post-fold matrix. Hypothesis: the <=2 rank-1 boundary-correction
einsums are pass-bound (s<=2-wide dots pay full MXU pipeline passes)
and cost more than the removed Fb2_inv matmul saves on XLA's schedule.

Usage: python scripts/probe_fold_xla.py
"""

import sys

import numpy as np

sys.path.insert(0, 'scripts')
from _timing import fence_vec, measure  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.ops.mxu_fft import fused_ola_mxu

    # flagship monitor OLA params (extracted from the bench design:
    # 122.88 -> 61.44 MS/s, bw=40 MHz, nfft 16384 -> 8192); these edges
    # produce n_corr=2 boundary corrections in the folded constants
    nfft, nfft_out = 16384, 8192
    M = 1024
    zero_lo, zero_hi = 5526, 10858
    bounds_in = (5526, 10858)
    bounds_out = (1430, 6762)

    rng = np.random.default_rng(0)
    planes = jnp.asarray(
        rng.standard_normal((2, M, nfft)).astype('float32')
    )

    results = {}
    # 'force' = folded H0 + corrections-as-einsums (the measured-slower
    # path production no longer takes when n_corr > 0); False = the
    # literal four-matmul chain the dispatch now picks here
    for fold in ('force', False):
        def step(pl, fold=fold):
            fr = pl[0] + 1j * pl[1]
            out = fused_ola_mxu(
                fr,
                nfft=nfft,
                nfft_out=nfft_out,
                zero_lo=zero_lo,
                zero_hi=zero_hi,
                bounds_in=bounds_in,
                bounds_out=bounds_out,
                precision=jax.lax.Precision.HIGHEST,
                fold=fold,
            )
            return fence_vec(out)

        jitted = jax.jit(step)
        dt, t_compile = measure(jitted, planes)
        results[fold] = dt
        print(
            f'fold={fold}: {dt * 1e3:.3f} ms/step '
            f'({M * nfft / dt / 1e6:.0f} M frame-samples/s; '
            f'compile {t_compile:.1f}s)',
            flush=True,
        )

    # numerical agreement of the two paths
    def both(pl):
        fr = pl[0] + 1j * pl[1]
        kw = dict(
            nfft=nfft, nfft_out=nfft_out, zero_lo=zero_lo, zero_hi=zero_hi,
            bounds_in=bounds_in, bounds_out=bounds_out,
            precision=jax.lax.Precision.HIGHEST,
        )
        a = fused_ola_mxu(fr, fold='force', **kw)
        b = fused_ola_mxu(fr, fold=False, **kw)
        scale = jnp.abs(b).max()
        return jnp.broadcast_to(
            (jnp.abs(a - b).max() / scale).astype(jnp.float32)[None], (8,)
        )

    err = float(np.asarray(jax.jit(both)(planes))[0])
    print(f'fold vs unfold rel err: {err:.3e}')
    ratio = results['force'] / results[False]
    print(f'fold/unfold time ratio: {ratio:.3f}')


if __name__ == '__main__':
    main()
