"""Two on-chip micro-probes (round 3):

1. APD histogram at navg=1 scale (8.4M samples, 2048 edges):
   edge-compare kernel (O(B) compares/sample) vs factored packed
   counting (O(2*sqrt(B)) cells/sample) — sizes where the 'packed'
   apd_kernel option should win.

2. Block-diagonal frame pairing for the fused-OLA Fa stages: the
   packed layout has a = 64, so the Fa/Fa_inv contractions run at
   half MXU width. Pairing two frames as one (128, b) unit with a
   block-diagonal [[Fa, 0], [0, Fa]] constant fills the contraction.
   This probe times the two dot formulations in isolation through a
   minimal Pallas kernel to decide whether restructuring the OLA
   kernel is worth it.

Run: python scripts/probe_blockdiag_apd.py   (claims the TPU chip)
"""

import functools
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


def probe_blockdiag():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a, b = 64, 256
    T = 16  # frames per grid step (flagship default)
    M = 2048  # frames per chunk at the flagship shape

    i1 = np.arange(a)
    Fa = np.exp(-2j * np.pi * np.outer(i1, i1) / a).astype('complex64')
    far, fai = Fa.real.copy(), Fa.imag.copy()
    Fa2r = np.zeros((2 * a, 2 * a), 'float32')
    Fa2i = np.zeros((2 * a, 2 * a), 'float32')
    Fa2r[:a, :a] = Fa2r[a:, a:] = far
    Fa2i[:a, :a] = Fa2i[a:, a:] = fai

    def dot3(x, y, dnums):
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        yh = y.astype(jnp.bfloat16)
        yl = (y - yh.astype(jnp.float32)).astype(jnp.bfloat16)
        dd = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=dnums,
            preferred_element_type=jnp.float32,
        )
        return dd(xh, yh) + dd(xh, yl) + dd(xl, yh)

    def gauss_left(fr, fi, xr, xi, Tb, aa):
        dn = (((2,), (1,)), ((0,), (0,)))
        bc = lambda m: jnp.broadcast_to(m[None], (Tb,) + m.shape)  # noqa: E731
        m1 = dot3(bc(fr), xr + xi, dn)
        m2 = dot3(bc(fr + fi), xi, dn)
        m3 = dot3(bc(fi - fr), xr, dn)
        return m1 - m2, m1 + m3

    def kern_batched(ar, ai, fr, fi, out):
        xr = ar[...].reshape(T, a, b)
        xi = ai[...].reshape(T, a, b)
        br, bi = gauss_left(fr[...], fi[...], xr, xi, T, a)
        out[...] = (br + bi).reshape(T * a, b)

    def kern_blockdiag(ar, ai, fr, fi, out):
        xr = ar[...].reshape(T // 2, 2 * a, b)
        xi = ai[...].reshape(T // 2, 2 * a, b)
        br, bi = gauss_left(fr[...], fi[...], xr, xi, T // 2, 2 * a)
        out[...] = (br + bi).reshape(T * a, b)

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((M * a, b)).astype('float32'))
    xi = jnp.asarray(rng.standard_normal((M * a, b)).astype('float32'))

    def build(kern, fr, fi):
        spec = pl.BlockSpec((T * a, b), lambda m: (m, 0))
        cspec = lambda c: pl.BlockSpec(c.shape, lambda m: (0, 0))  # noqa: E731

        @jax.jit
        def run(xr, xi):
            return pl.pallas_call(
                kern,
                grid=(M // T,),
                in_specs=[spec, spec, cspec(fr), cspec(fi)],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((M * a, b), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=('arbitrary',),
                ),
            )(xr, xi, fr, fi)

        return run

    run_b = build(kern_batched, jnp.asarray(far), jnp.asarray(fai))
    run_d = build(kern_blockdiag, jnp.asarray(Fa2r), jnp.asarray(Fa2i))

    out_b = None
    for name, fn in [('batched a=64', run_b), ('blockdiag 128', run_d)]:
        dt, _ = measure(lambda x, _fn=fn: _fn(x, xi), xr)
        o = np.asarray(fn(xr, xi))
        if out_b is None:
            out_b = o
        err = np.abs(o - out_b).max() / max(np.abs(out_b).max(), 1e-9)
        print(
            f'Fa-stage {name:14s} {dt * 1e3:7.3f} ms  (match {err:.1e})',
            flush=True,
        )


def main():
    import jax

    print('devices:', jax.devices(), flush=True)
    probe_apd()
    probe_blockdiag()


if __name__ == '__main__':
    sys.exit(main())
