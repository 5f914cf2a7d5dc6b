"""exact streaming quantiles (VERDICT r3 #4): the two-pass refinement in
streaming_persistence_spectrum must reproduce jnp.quantile of the full
same-compiled spectrogram BIT FOR BIT — making the streaming path exact
where the reference's exact one-shot quantile (fourier.py:1320) cannot
stream at all — at any capture length, including the 100 Ms scale bar.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import iqwaveform_tpu.parallel.streaming as streaming
from iqwaveform_tpu.parallel.streaming import (
    _spectrogram_dB_chunk,
    design_persistence,
    streaming_persistence_spectrum,
)

QS = (0.5, 0.95, 0.99)


def _oracle_quantiles(x, *, nfft, chunk_frames, backend, hist_bins, qs=QS):
    """jnp.quantile of the full capture's spectrogram, computed through
    the SAME compiled chunk transform the streaming fold uses (XLA's
    fusion makes the dB spectrogram context-dependent at the last ulp,
    so exactness is defined relative to a same-compiled transform)."""
    design = design_persistence(
        nfft=nfft,
        window='hann',
        dtype='complex64',
        hist_range_dB=(-150.0, 50.0),
        hist_bins=hist_bins,
        fft_backend=backend,
        fft_precision='highest',
    )
    chunk = chunk_frames * nfft
    nc = x.shape[0] // chunk
    xc = jnp.asarray(x[: nc * chunk]).reshape(nc, chunk)
    collect = jax.jit(
        lambda xs: jax.lax.scan(
            lambda c, cx: (c, _spectrogram_dB_chunk(cx, design)), 0, xs
        )[1]
    )
    spgs = np.asarray(collect(xc)).reshape(-1, nfft)
    tail = x[nc * chunk :]
    tk = tail.shape[0] // nfft * nfft
    if tk:
        spg_t = np.asarray(
            jax.jit(lambda v: _spectrogram_dB_chunk(v, design))(
                jnp.asarray(tail[:tk])
            )
        )
        spgs = np.concatenate([spgs, spg_t])
    u = design['unscramble']
    if u is not None:
        spgs = spgs[:, u]
    return np.asarray(
        jnp.quantile(
            jnp.asarray(spgs), jnp.asarray(qs, dtype='float32'), axis=0
        )
    )


def _noise(n, seed):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal(n).astype('float32')
        + 1j * rng.standard_normal(n).astype('float32')
    ).astype('complex64')


@pytest.mark.parametrize('backend', ['mxu', 'xla'])
@pytest.mark.parametrize('narrowed', [False, True])
def test_exact_quantiles_bit_exact(backend, narrowed, monkeypatch):
    """both refinement paths (direct collect; sub-histogram narrowing)
    match jnp.quantile bit for bit, including tail-frame folding and
    the mxu backend's factored bin order."""
    if narrowed:
        # force the narrowing pass at small capture sizes
        monkeypatch.setattr(streaming, '_C_DIRECT', 8)
    nfft, cf = 512, 64
    n = cf * nfft * 6 + 3 * nfft  # 6 chunks + 3 tail frames
    x = _noise(n, 7)
    out = streaming_persistence_spectrum(
        jnp.asarray(x),
        fs=1e6,
        window='hann',
        nfft=nfft,
        chunk_frames=cf,
        hist_bins=256,
        quantiles=QS,
        fft_backend=backend,
        fft_precision='highest',
        exact_quantiles=True,
    )
    assert out.get('quantiles_exact') is True
    oracle = _oracle_quantiles(
        x, nfft=nfft, chunk_frames=cf, backend=backend, hist_bins=256
    )
    np.testing.assert_array_equal(np.asarray(out['quantiles_dB']), oracle)


def test_exact_quantiles_tone_degenerate():
    """a pure tone concentrates one frequency's values into very few
    distinct levels (histogram mass in one bin) — the degenerate case
    for bracket narrowing; still bit-exact."""
    nfft, cf = 256, 32
    n = cf * nfft * 4
    t = np.arange(n)
    x = (
        np.exp(2j * np.pi * 0.125 * t) + 0.001 * _noise(n, 11)
    ).astype('complex64')
    out = streaming_persistence_spectrum(
        jnp.asarray(x),
        fs=1e6,
        window='hann',
        nfft=nfft,
        chunk_frames=cf,
        hist_bins=128,
        quantiles=QS,
        fft_backend='xla',
        fft_precision='highest',
        exact_quantiles=True,
    )
    oracle = _oracle_quantiles(
        x, nfft=nfft, chunk_frames=cf, backend='xla', hist_bins=128
    )
    np.testing.assert_array_equal(np.asarray(out['quantiles_dB']), oracle)


def test_exact_quantiles_100ms():
    """the VERDICT r3 #4 scale bar: 100 Ms capture, bit-exact vs
    jnp.quantile, through the narrowing path (in-bracket counts at this
    length far exceed the direct-collect threshold)."""
    nfft, cf = 1024, 512
    n = 100_000_000
    x = _noise(n, 8)
    out = streaming_persistence_spectrum(
        jnp.asarray(x),
        fs=1e6,
        window='hann',
        nfft=nfft,
        chunk_frames=cf,
        hist_bins=1024,
        quantiles=QS,
        fft_backend='mxu',
        fft_precision='highest',
        exact_quantiles=True,
    )
    assert out.get('quantiles_exact') is True
    oracle = _oracle_quantiles(
        x, nfft=nfft, chunk_frames=cf, backend='mxu', hist_bins=1024
    )
    np.testing.assert_array_equal(np.asarray(out['quantiles_dB']), oracle)
    # and the histogram-inverted estimate it replaces was only
    # bin-accurate: the refinement must have moved values
    approx = streaming_persistence_spectrum(
        jnp.asarray(x),
        fs=1e6,
        window='hann',
        nfft=nfft,
        chunk_frames=cf,
        hist_bins=1024,
        quantiles=QS,
        fft_backend='mxu',
        fft_precision='highest',
        exact_quantiles=False,
    )
    d = np.abs(np.asarray(approx['quantiles_dB']) - oracle).max()
    assert 0 < d < 0.2  # within one coarse bin, but not exact


def test_exact_quantiles_requires_histogram():
    x = _noise(131072, 3)
    with pytest.raises(ValueError, match='hist_bins'):
        streaming_persistence_spectrum(
            jnp.asarray(x),
            fs=1e6,
            window='hann',
            nfft=256,
            chunk_frames=64,
            hist_bins=0,
            fft_backend='xla',
            exact_quantiles=True,
        )


def test_exact_quantiles_rejects_resumed_carry():
    x = _noise(131072, 4)
    kws = dict(
        fs=1e6,
        window='hann',
        nfft=256,
        chunk_frames=64,
        hist_bins=128,
        fft_backend='xla',
    )
    out = streaming_persistence_spectrum(jnp.asarray(x), **kws)
    with pytest.raises(ValueError, match='resumed carry'):
        streaming_persistence_spectrum(
            jnp.asarray(x), init_carry=out, exact_quantiles=True, **kws
        )


def test_bracket_plan_pads_extreme_clamps():
    """the pmin/pmax clamps must sit several ulps OUTSIDE the fold
    pass's recorded extremes: the collect pass recomputes the
    spectrogram in a differently-fused compiled body whose values
    legally drift ~1 ulp, and the in-bracket test is half-open
    [lo, hi) — a max exactly 1 ulp above pmax fell ON the old
    nextafter(pmax) clamp and out of its own bracket (round-5 fuzz
    regression, fuzz_parity seed 5 case 20)."""
    F, B = 4, 64
    hist = np.zeros((F, B), np.int64)
    hist[:, 0] = 17  # all mass in the end catch-all bins
    hist[:, -1] = 17
    edges = np.linspace(-150.0, 50.0, B + 1).astype('float32')
    pmin = np.full(F, -54.18493, 'float32')
    pmax = np.full(F, -11.920141, 'float32')
    plan = streaming._bracket_plan(
        hist, edges, 34, [0.0, 0.99, 1.0], pmin, pmax
    )
    ulp_lo = np.spacing(np.abs(pmin), dtype=np.float32)
    ulp_hi = np.spacing(np.abs(pmax), dtype=np.float32)
    # q=0.0 targets rank 0 in the catch-all first bin: its lower bound
    # is the pmin clamp, which must sit >= 4 ulps below pmin. q=1.0
    # targets rank n-1 in the catch-all last bin: its upper bound is
    # the pmax clamp, >= 4 ulps above pmax. Every bracket finite.
    assert (plan['lo'][0] <= pmin - 4 * ulp_lo).all()
    assert (plan['hi'][2] >= pmax + 4 * ulp_hi).all()
    assert np.isfinite(plan['lo']).all() and np.isfinite(plan['hi']).all()


@pytest.mark.parametrize('narrowed', [False, True])
def test_exact_quantiles_extreme_ranks(narrowed, monkeypatch):
    """quantiles 0.0 and 1.0 target ranks 0 and n-1 — the exact column
    extremes, whose brackets are clamped by pmin/pmax and which the
    collect pass must retain despite recompile drift."""
    if narrowed:
        monkeypatch.setattr(streaming, '_C_DIRECT', 8)
    nfft, cf = 256, 32
    n = cf * nfft * 3 + 2 * nfft
    x = _noise(n, 29)
    qs = (0.0, 0.99, 1.0)
    out = streaming_persistence_spectrum(
        jnp.asarray(x),
        fs=1e6,
        window='hann',
        nfft=nfft,
        chunk_frames=cf,
        hist_bins=128,
        quantiles=qs,
        fft_backend='xla',
        fft_precision='highest',
        exact_quantiles=True,
    )
    assert out.get('quantiles_exact') is True
    oracle = _oracle_quantiles(
        x, nfft=nfft, chunk_frames=cf, backend='xla', hist_bins=128, qs=qs
    )
    np.testing.assert_array_equal(np.asarray(out['quantiles_dB']), oracle)


def test_exact_quantiles_raises_clearly_under_jit():
    """exact_quantiles=True is a host-orchestrated multi-pass and must
    fail at TRACE time with an actionable message, not a deep
    TracerArrayConversionError from the refinement's D2H (the round-4
    psd matrix config crashed exactly that way, matrix_r04)."""
    nfft, cf = 256, 32
    x = _noise(cf * nfft, 7)
    kws = dict(
        fs=1e6, window='hann', nfft=nfft, chunk_frames=cf,
        hist_bins=64, fft_backend='xla', exact_quantiles=True,
    )
    fn = jax.jit(lambda v: streaming_persistence_spectrum(v, **kws))
    with pytest.raises(ValueError, match='cannot execute under jit'):
        fn(jnp.asarray(x))
