"""Sharded pipeline tests on the virtual 8-device CPU mesh.

Oracle: the single-device ops implementations — sharded results must match
them exactly (detectors, OLA) or to histogram resolution (quantiles).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iqwaveform_tpu import fourier, parallel

from conftest import make_tone_noise


@pytest.fixture(scope='module')
def mesh():
    return parallel.time_mesh(8)


def test_mesh_has_8_devices(mesh):
    assert mesh.shape[parallel.TIME_AXIS] == 8


def test_sharded_stft_matches_single_device(mesh):
    nperseg, noverlap = 256, 128
    hop = nperseg - noverlap
    n = 8 * hop * 64
    x = make_tone_noise(n)
    xs = parallel.shard_time_axis(jnp.asarray(x), mesh)

    Ys = parallel.sharded_stft(
        xs, mesh=mesh, window='hamming', nperseg=nperseg, noverlap=noverlap
    )
    # single-device oracle on the zero-extended capture ('extend' semantics)
    x_ext = np.concatenate([x, np.zeros(noverlap, x.dtype)])
    Y = fourier.stft(
        x_ext, fs=1e6, window='hamming', nperseg=nperseg, noverlap=noverlap,
        return_axis_arrays=False,
    )
    assert Ys.shape == Y.shape
    np.testing.assert_allclose(np.asarray(Ys), np.asarray(Y), atol=1e-5)


def test_sharded_stft_no_overlap(mesh):
    nperseg = 256
    n = 8 * nperseg * 16
    x = make_tone_noise(n)
    xs = parallel.shard_time_axis(jnp.asarray(x), mesh)
    Ys = parallel.sharded_stft(xs, mesh=mesh, window='hann', nperseg=nperseg)
    Y = fourier.stft(
        x, fs=1e6, window='hann', nperseg=nperseg, return_axis_arrays=False
    )
    np.testing.assert_allclose(np.asarray(Ys), np.asarray(Y), atol=1e-5)


def test_sharded_spectrogram(mesh):
    nperseg = 128
    n = 8 * nperseg * 8
    x = make_tone_noise(n)
    xs = parallel.shard_time_axis(jnp.asarray(x), mesh)
    spg_s = parallel.sharded_spectrogram(xs, mesh=mesh, window='hann', nperseg=nperseg)
    spg = fourier.spectrogram(
        x, fs=1e6, window='hann', nperseg=nperseg, return_axis_arrays=False
    )
    np.testing.assert_allclose(np.asarray(spg_s), np.asarray(spg), atol=1e-6)


def test_sharded_ola_filter_matches_single_device(mesh):
    fs = 1e6
    nfft = 512
    n = 8 * (nfft // 2) * 32
    x = make_tone_noise(n, fs=fs)
    xs = parallel.shard_time_axis(jnp.asarray(x), mesh)

    ys = parallel.sharded_ola_filter(
        xs, mesh=mesh, fs=fs, nfft=nfft, window='hamming', passband=(-2e5, 2e5)
    )
    y = fourier.ola_filter(
        x, fs=fs, nfft=nfft, window='hamming', passband=(-2e5, 2e5), extend=True
    )
    ys_np = np.asarray(ys)
    y_np = np.asarray(y)
    # single-device istft output is F*hop + noverlap long; sharded output is
    # exactly n samples. values must agree except the final noverlap-sample
    # tail transient (zero-extension edge semantics differ there)
    m = min(ys_np.shape[0], y_np.shape[0]) - nfft // 2
    np.testing.assert_allclose(ys_np[:m], y_np[:m], atol=1e-4)


def test_sharded_ola_filter_resample(mesh):
    fs = 1e6
    nfft, nfft_out = 512, 256
    n = 8 * (nfft // 2) * 32
    x = make_tone_noise(n, fs=fs, f_tone=50e3, snr_db=60)
    xs = parallel.shard_time_axis(jnp.asarray(x), mesh)

    ys = parallel.sharded_ola_filter(
        xs,
        mesh=mesh,
        fs=fs,
        nfft=nfft,
        nfft_out=nfft_out,
        window='hamming',
        passband=(-1e5, 1e5),
    )
    ys_np = np.asarray(ys)
    assert ys_np.shape[0] == n // 2

    y = np.asarray(
        fourier.ola_filter(
            x,
            fs=fs,
            nfft=nfft,
            nfft_out=nfft_out,
            window='hamming',
            passband=(-1e5, 1e5),
            extend=True,
        )
    )
    # exclude the final noverlap_out tail transient (see matching test above)
    m = min(ys_np.shape[0], y.shape[0]) - nfft_out // 2
    np.testing.assert_allclose(ys_np[:m], y[:m], atol=1e-4)


def test_sharded_psd_stats(mesh):
    fs = 1e6
    nperseg = 128
    n = 8 * nperseg * 32
    x = make_tone_noise(n, fs=fs)
    xs = parallel.shard_time_axis(jnp.asarray(x), mesh)

    stats, hist, edges = parallel.sharded_psd_stats(
        xs, mesh=mesh, fs=fs, window='hann', nperseg=nperseg,
        statistics=('mean', 'max', 'min'),
    )

    freqs, times, spg = fourier.spectrogram(x, fs=fs, window='hann', nperseg=nperseg)
    spg_dB = 10 * np.log10(np.asarray(spg) + 1e-25)

    np.testing.assert_allclose(np.asarray(stats[0]), spg_dB.mean(axis=0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(stats[1]), spg_dB.max(axis=0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats[2]), spg_dB.min(axis=0), atol=1e-4)

    # histogram-quantile matches exact quantile to bin resolution
    q = parallel.quantile_from_histogram(hist, edges, jnp.asarray([0.5]))
    exact = np.quantile(spg_dB, 0.5, axis=0)
    bin_width = edges[1] - edges[0]
    assert np.abs(np.asarray(q)[0] - exact).max() <= 2 * bin_width


def test_sharded_apd_matches_sample_ccdf(mesh):
    n = 8 * 4096
    x = make_tone_noise(n)
    xs = parallel.shard_time_axis(jnp.asarray(x), mesh)

    p = np.abs(x) ** 2
    edges = np.linspace(0, float(p.max()) * 1.01, 64).astype('float32')

    counts = parallel.sharded_apd_histogram(xs, mesh=mesh, edges=edges)
    ccdf = parallel.ccdf_from_counts(counts, n)

    from iqwaveform_tpu import sample_ccdf

    expected = sample_ccdf(p.astype('float32'), edges)
    np.testing.assert_allclose(np.asarray(ccdf), expected, atol=1e-5)


def test_sharded_pipeline_jits(mesh):
    """the whole sharded pipeline must compile as one jit program."""
    nfft = 256
    n = 8 * (nfft // 2) * 16
    x = make_tone_noise(n)
    xs = parallel.shard_time_axis(jnp.asarray(x), mesh)

    @jax.jit
    def step(x):
        y = parallel.sharded_ola_filter(
            x, mesh=mesh, fs=1e6, nfft=nfft, window='hamming',
            passband=(-2e5, 2e5),
        )
        return parallel.sharded_spectrogram(
            y, mesh=mesh, window='hann', nperseg=nfft
        )

    out = step(xs)
    assert out.shape == (n // nfft, nfft)


def test_streaming_persistence_matches_direct():
    fs = 1e6
    nfft = 128
    n = nfft * 64 * 4
    x = make_tone_noise(n, fs=fs)

    res = parallel.streaming_persistence_spectrum(
        jnp.asarray(x), fs=fs, window='hann', nfft=nfft, chunk_frames=64,
        quantiles=(0.5,), hist_bins=4096,
    )

    freqs, times, spg = fourier.spectrogram(x, fs=fs, window='hann', nperseg=nfft)
    spg_dB = 10 * np.log10(np.asarray(spg) + 1e-25)

    np.testing.assert_allclose(np.asarray(res['mean_dB']), spg_dB.mean(axis=0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(res['max_dB']), spg_dB.max(axis=0), atol=1e-4)
    exact_median = np.quantile(spg_dB, 0.5, axis=0)
    bw = res['hist_edges_dB'][1] - res['hist_edges_dB'][0]
    # histogram inversion vs np.quantile order-statistic interpolation:
    # agreement to a few bin widths
    assert np.abs(np.asarray(res['quantiles_dB'])[0] - exact_median).max() <= 5 * bw


@pytest.mark.parametrize('noverlap', [0, 256])
@pytest.mark.parametrize('narrowed', [False, True])
def test_sharded_psd_exact_quantiles(noverlap, narrowed, monkeypatch):
    """sharded_psd_stats(exact_quantiles=True) matches jnp.quantile of
    the full gathered spectrogram bit for bit — including the halo
    frames of overlapped framing and the sub-histogram narrowing path —
    while only all-gathering O(C) values per frequency (the sharded
    counterpart of the streaming two-pass refinement, round 4)."""
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from iqwaveform_tpu.ops.window_design import get_window
    from iqwaveform_tpu.parallel import sharded as sh, streaming as S
    from iqwaveform_tpu.parallel.mesh import TIME_AXIS

    if narrowed:
        monkeypatch.setattr(S, '_C_DIRECT', 8)

    mesh = jax.make_mesh(
        (8,), (TIME_AXIS,), axis_types=(jax.sharding.AxisType.Auto,)
    )
    rng = np.random.default_rng(5)
    nperseg = 512
    n = 8 * nperseg * 48
    x = jnp.asarray(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            'complex64'
        )
    )
    x = jax.device_put(x, NamedSharding(mesh, P(TIME_AXIS)))
    qs = (0.5, 0.95, 0.99)

    stats, hist, edges = sh.sharded_psd_stats(
        x, mesh=mesh, fs=1e6, window='hann', nperseg=nperseg,
        noverlap=noverlap, statistics=('mean',) + qs, hist_bins=512,
        exact_quantiles=True,
    )

    w = get_window(
        'hann', nperseg, xp=np, dtype='complex64', norm=True, fftshift=True
    )

    def body(xl):
        spg = sh._sharded_stft_local(
            xl, w=w, nperseg=nperseg, noverlap=noverlap, norm='power',
            axis_name=TIME_AXIS,
        )
        spg = spg.real * spg.real + spg.imag * spg.imag
        return 10.0 * jnp.log10(spg + 1e-25)

    spg_all = jax.shard_map(
        body, mesh=mesh, in_specs=P(TIME_AXIS), out_specs=P(TIME_AXIS)
    )(x)
    oracle = np.asarray(
        jnp.quantile(spg_all, jnp.asarray(qs, dtype='float32'), axis=0)
    )
    np.testing.assert_array_equal(np.asarray(stats[1:]), oracle)
    # the approximate inversion the refinement replaces differs
    approx, _, _ = sh.sharded_psd_stats(
        x, mesh=mesh, fs=1e6, window='hann', nperseg=nperseg,
        noverlap=noverlap, statistics=qs, hist_bins=512,
    )
    assert np.abs(np.asarray(approx) - oracle).max() > 0


def test_persistence_raw_carry_matches_per_chunk_extraction():
    """the packed-counter RAW tile carry (counts extracted once at
    flush/readout instead of per chunk — the round-4 streaming fold
    optimization) is bit-identical to per-chunk extraction."""
    from iqwaveform_tpu.parallel import streaming as S

    fs = 1e6
    nfft = 1024
    n = 131072 * 4
    x = jnp.asarray(make_tone_noise(n, fs=fs))
    kws = dict(
        fs=fs, window='hann', nfft=nfft, chunk_frames=128, hist_bins=512,
        fft_backend='pallas', fft_precision='highest',
    )
    out_raw = S.streaming_persistence_spectrum(x, **kws)
    # the raw representation must actually be engaged, and the returned
    # resume carry must be flushed
    assert out_raw['_carry'].hist_raw is not None
    assert (np.asarray(out_raw['_carry'].hist_raw) == 0).all()

    orig = S.design_persistence

    def no_raw(**k):
        d = orig(**k)
        d['hist_raw_plan'] = None
        return d

    S.design_persistence = no_raw
    try:
        out_old = S.streaming_persistence_spectrum(x, **kws)
    finally:
        S.design_persistence = orig
    assert out_old['_carry'].hist_raw is None

    np.testing.assert_array_equal(
        np.asarray(out_raw['hist']), np.asarray(out_old['hist'])
    )
    np.testing.assert_array_equal(
        np.asarray(out_raw['quantiles_dB']), np.asarray(out_old['quantiles_dB'])
    )


def test_persistence_raw_carry_flush_period(monkeypatch):
    """forcing a flush after every chunk (the f32 exact-integer
    overflow guard) must not change any count, and resume through a
    raw-carrying result dict must match the one-shot fold."""
    from iqwaveform_tpu.parallel import streaming as S

    fs = 1e6
    nfft = 1024
    n = 131072 * 4
    x = jnp.asarray(make_tone_noise(n, fs=fs))
    kws = dict(
        fs=fs, window='hann', nfft=nfft, chunk_frames=128, hist_bins=512,
        fft_backend='pallas', fft_precision='highest',
    )
    base = S.streaming_persistence_spectrum(x, **kws)
    monkeypatch.setattr(S, '_FLUSH_FRAMES', 128)  # flush every chunk
    every = S.streaming_persistence_spectrum(x, **kws)
    np.testing.assert_array_equal(
        np.asarray(base['hist']), np.asarray(every['hist'])
    )
    monkeypatch.undo()

    half = n // 2
    o1 = S.streaming_persistence_spectrum(x[:half], **kws)
    o2 = S.streaming_persistence_spectrum(x[half:], init_carry=o1, **kws)
    np.testing.assert_array_equal(
        np.asarray(o2['hist']), np.asarray(base['hist'])
    )


def test_streaming_apd_matches_sample_ccdf():
    x = make_tone_noise(100000)
    p = np.abs(x) ** 2
    edges = np.linspace(0, float(p.max()) * 1.01, 100).astype('float32')

    counts = parallel.streaming_apd(jnp.asarray(x), edges=edges, chunk_size=8192)
    ccdf = parallel.ccdf_from_counts(counts, x.shape[0])

    from iqwaveform_tpu import sample_ccdf

    expected = sample_ccdf(p.astype('float32'), edges)
    np.testing.assert_allclose(np.asarray(ccdf), expected, atol=1e-5)


def test_streaming_apd_detector_binned():
    """navg > 1 counts the detector-binned power series (the reference
    CCDF workflow, figures.py:827-836)."""
    navg = 16
    n = 128 * navg * 13
    x = make_tone_noise(n)
    p = (np.abs(x) ** 2).astype('float32')
    p_det = p[: (n // navg) * navg].reshape(-1, navg).mean(axis=1)
    edges = np.linspace(0, float(p.max()) * 1.01, 64).astype('float32')

    counts = parallel.streaming_apd(
        jnp.asarray(x), edges=edges, chunk_size=navg * 512, navg=navg
    )
    expected = np.searchsorted(edges, p_det, side='left')
    expected = np.bincount(expected, minlength=edges.shape[0] + 1)
    got = np.asarray(counts)
    assert got.sum() == expected.sum()
    # binned_mean_matmul's f32 dot and reshape-mean may round a sample
    # across an edge; cumulative counts agree within 1 everywhere
    assert np.abs(np.cumsum(got) - np.cumsum(expected)).max() <= 1


def test_persistence_stats_only_fold():
    """hist_bins=0: stats-only persistence design (no histogram in the
    fold/carry) reproduces the public spectrogram's mean/max/min dB."""
    from iqwaveform_tpu.parallel.streaming import (
        design_persistence,
        persistence_finalize,
        persistence_fold,
        persistence_init,
    )

    nperseg = 256
    x = make_tone_noise(nperseg * 128)
    design = design_persistence(
        nfft=nperseg, window='hann', hist_bins=0, fft_backend='mxu'
    )
    c = persistence_fold(persistence_init(design), jnp.asarray(x), design)
    assert c.hist is None
    out = persistence_finalize(c, design, fs=1e6)
    assert 'hist' not in out and 'quantiles_dB' not in out

    spg = fourier.spectrogram(
        x, fs=1e6, window='hann', nperseg=nperseg, return_axis_arrays=False
    )
    spg_dB = 10 * np.log10(np.asarray(spg) + 1e-25)
    np.testing.assert_allclose(
        np.asarray(out['mean_dB']), spg_dB.mean(axis=0), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out['max_dB']), spg_dB.max(axis=0), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out['min_dB']), spg_dB.min(axis=0), atol=2e-3
    )


def test_streaming_persistence_pallas_backend():
    """fft_backend='pallas' (fused window->DFT->dB kernel, interpret
    mode on CPU) matches the mxu factored path at each precision tier."""
    fs = 1e6
    nfft = 256
    n = 1024 * 128  # one kernel grid step
    x = make_tone_noise(n, fs=fs)
    kw = dict(fs=fs, window='hann', nfft=nfft, chunk_frames=n // nfft,
              quantiles=(0.5,), hist_bins=256)

    r_mxu = parallel.streaming_persistence_spectrum(
        jnp.asarray(x), fft_backend='mxu', **kw
    )
    r_pal = parallel.streaming_persistence_spectrum(
        jnp.asarray(x), fft_backend='pallas', **kw
    )
    np.testing.assert_allclose(
        np.asarray(r_pal['mean_dB']), np.asarray(r_mxu['mean_dB']), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(r_pal['max_dB']), np.asarray(r_mxu['max_dB']), atol=1e-3
    )
    cum = np.abs(
        np.cumsum(np.asarray(r_pal['hist']), axis=1)
        - np.cumsum(np.asarray(r_mxu['hist']), axis=1)
    )
    assert cum.max() <= 2

    # 3-pass tier tracks highest within its documented error
    r_hi = parallel.streaming_persistence_spectrum(
        jnp.asarray(x), fft_backend='pallas', fft_precision='high', **kw
    )
    inband = np.asarray(r_mxu['mean_dB']) > -60
    d = np.abs(np.asarray(r_hi['mean_dB']) - np.asarray(r_mxu['mean_dB']))
    assert d[inband].max() < 0.01  # dB

    # unsupported nfft rejected at design time
    with pytest.raises(ValueError, match='pallas'):
        parallel.streaming_persistence_spectrum(
            jnp.asarray(x), fs=fs, window='hann', nfft=192,
            chunk_frames=n // 192, fft_backend='pallas',
        )


def test_streaming_persistence_fused_levels_fold():
    """at nfft >= 1024 the pallas backend takes the fused
    levels+stats fold (VERDICT r2 #2: the dB spectrogram never
    round-trips through HBM) — results must match the mxu factored path
    like the unfused pallas fold does."""
    from iqwaveform_tpu.parallel import streaming as streaming_mod

    fs = 1e6
    nfft = 1024
    n = 1024 * 128 * 2  # two kernel grid steps per chunk, two chunks
    x = make_tone_noise(2 * n, fs=fs)
    kw = dict(fs=fs, window='hann', nfft=nfft, chunk_frames=n // nfft,
              quantiles=(0.5, 0.99), hist_bins=512)

    # the fused branch must actually engage at this shape
    design = streaming_mod.design_persistence(
        nfft=nfft, window='hann', hist_bins=512, fft_backend='pallas'
    )
    chunk = jnp.zeros((n,), jnp.complex64)
    assert streaming_mod._fused_levels_fold(
        streaming_mod.persistence_init(design), chunk, design
    ) is not None

    r_mxu = parallel.streaming_persistence_spectrum(
        jnp.asarray(x), fft_backend='mxu', **kw
    )
    r_pal = parallel.streaming_persistence_spectrum(
        jnp.asarray(x), fft_backend='pallas', **kw
    )
    np.testing.assert_allclose(
        np.asarray(r_pal['mean_dB']), np.asarray(r_mxu['mean_dB']), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(r_pal['max_dB']), np.asarray(r_mxu['max_dB']), atol=1e-3
    )
    # min of dB picks the deepest noise-floor frame, where the kernel's
    # ln vs the mxu path's log10 differ by float32 rounding at near-ties
    np.testing.assert_allclose(
        np.asarray(r_pal['min_dB']), np.asarray(r_mxu['min_dB']), atol=5e-3
    )
    cum = np.abs(
        np.cumsum(np.asarray(r_pal['hist']), axis=1)
        - np.cumsum(np.asarray(r_mxu['hist']), axis=1)
    )
    assert cum.max() <= 2
    # counts totals exact: every frame counted exactly once per freq
    assert (np.asarray(r_pal['hist']).sum(axis=1) == 2 * n // nfft).all()
    # histogram quantiles agree to bin resolution
    np.testing.assert_allclose(
        np.asarray(r_pal['quantiles_dB']),
        np.asarray(r_mxu['quantiles_dB']),
        atol=2 * (200.0 / 512),
    )


def test_streaming_persistence_mxu_backend_and_resume():
    """fft_backend='mxu' (factored bin order + readout unscramble)
    matches the XLA path, and init_carry continues accumulation: two
    halves == one run."""
    fs = 1e6
    nfft = 256
    n = nfft * 64 * 4
    x = make_tone_noise(n, fs=fs)
    kw = dict(fs=fs, window='hann', nfft=nfft, chunk_frames=64,
              quantiles=(0.5,), hist_bins=512)

    r_xla = parallel.streaming_persistence_spectrum(jnp.asarray(x), **kw)
    r_mxu = parallel.streaming_persistence_spectrum(
        jnp.asarray(x), fft_backend='mxu', **kw
    )
    np.testing.assert_array_equal(
        np.asarray(r_xla['hist']).sum(axis=1),
        np.asarray(r_mxu['hist']).sum(axis=1),
    )
    cum = np.abs(
        np.cumsum(np.asarray(r_xla['hist']), axis=1)
        - np.cumsum(np.asarray(r_mxu['hist']), axis=1)
    )
    assert cum.max() <= 2  # float rounding at bin edges only
    np.testing.assert_allclose(
        np.asarray(r_mxu['mean_dB']), np.asarray(r_xla['mean_dB']), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(r_mxu['max_dB']), np.asarray(r_xla['max_dB']), atol=1e-4
    )

    # resume: first half then second half through init_carry (result
    # dict: design fingerprint validated)
    half = n // 2
    r1 = parallel.streaming_persistence_spectrum(
        jnp.asarray(x[:half]), fft_backend='mxu', **kw
    )
    r2 = parallel.streaming_persistence_spectrum(
        jnp.asarray(x[half:]), fft_backend='mxu', init_carry=r1, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(r2['hist']), np.asarray(r_mxu['hist'])
    )
    np.testing.assert_allclose(
        np.asarray(r2['mean_dB']), np.asarray(r_mxu['mean_dB']), atol=1e-5
    )

    # a carry accumulated under a different design must be rejected
    # (resuming an xla-order carry under mxu factored order would
    # silently corrupt per-bin statistics)
    with pytest.raises(ValueError, match='different design'):
        parallel.streaming_persistence_spectrum(
            jnp.asarray(x[half:]), fft_backend='xla', init_carry=r1, **kw
        )


def test_quantile_from_histogram_uniform():
    """uniform histogram -> quantiles linear in q."""
    hist = np.ones((3, 100), dtype='int32') * 10
    edges = np.linspace(0.0, 1.0, 101)
    q = parallel.quantile_from_histogram(hist, edges, np.array([0.25, 0.5, 0.75]))
    np.testing.assert_allclose(q[:, 0], [0.25, 0.5, 0.75], atol=0.02)


def test_carry_checkpoint_roundtrip(tmp_path):
    """streaming carries save/restore exactly (SURVEY.md §5 resume)."""
    import jax.numpy as jnp

    from iqwaveform_tpu.parallel import streaming

    carry = streaming.PersistenceCarry(
        hist=jnp.arange(12, dtype=jnp.int32).reshape(3, 4),
        psum=jnp.ones(3),
        pmax=jnp.full(3, 2.0),
        pmin=jnp.full(3, -2.0),
        count=jnp.asarray(7, jnp.int32),
    )
    path = str(tmp_path / 'carry.npz')
    streaming.save_carry(path, carry)

    blank = streaming.PersistenceCarry(
        hist=jnp.zeros((3, 4), jnp.int32),
        psum=jnp.zeros(3),
        pmax=jnp.zeros(3),
        pmin=jnp.zeros(3),
        count=jnp.asarray(0, jnp.int32),
    )
    restored = streaming.load_carry(path, blank)
    np.testing.assert_array_equal(np.asarray(restored.hist), np.asarray(carry.hist))
    np.testing.assert_array_equal(np.asarray(restored.count), 7)


def test_sharded_ola_filter_mxu_backend(mesh):
    fs = 1e6
    nfft, nfft_out = 512, 256
    n = 8 * nfft * 16
    x = make_tone_noise(n, fs=fs, f_tone=50e3, snr_db=60)
    xs = parallel.shard_time_axis(jnp.asarray(x), mesh)

    kw = dict(mesh=mesh, fs=fs, nfft=nfft, nfft_out=nfft_out,
              window='hamming', passband=(-1e5, 1e5))
    y_xla = np.asarray(parallel.sharded_ola_filter(xs, fft_backend='xla', **kw))
    y_mxu = np.asarray(parallel.sharded_ola_filter(xs, fft_backend='mxu', **kw))
    np.testing.assert_allclose(y_mxu, y_xla, atol=2e-5)


def test_sharded_ola_filter_blackmanharris(mesh):
    """R=5 COLA window through the sharded grouped path."""
    fs = 1e6
    nfft = 500  # divisible by 5
    hop = nfft - round(nfft * 4 / 5)
    n = 8 * hop * 50
    x = make_tone_noise(n, fs=fs)
    xs = parallel.shard_time_axis(jnp.asarray(x), mesh)

    ys = np.asarray(
        parallel.sharded_ola_filter(
            xs, mesh=mesh, fs=fs, nfft=nfft, window='blackmanharris',
            passband=(-2e5, 2e5),
        )
    )
    y = np.asarray(
        fourier.ola_filter(
            x, fs=fs, nfft=nfft, window='blackmanharris',
            passband=(-2e5, 2e5), extend=True,
        )
    )
    m = min(ys.shape[0], y.shape[0]) - round(nfft * 4 / 5)
    np.testing.assert_allclose(ys[:m], y[:m], atol=1e-4)


def test_sharded_channelize_power(mesh):
    fs = 1e6
    nch = 4
    fft_per_ch = 128
    n = 8 * fft_per_ch * nch * 8
    x = make_tone_noise(n, fs=fs, f_tone=fs / 8, snr_db=40)
    xs = parallel.shard_time_axis(jnp.asarray(x), mesh)

    power_s = parallel.sharded_channelize_power(
        xs, mesh=mesh, Ts=1 / fs, fft_size_per_channel=fft_per_ch,
        window='hann', channel_count=nch,
    )
    _, _, power = fourier.channelize_power(
        x, 1 / fs, fft_per_ch, analysis_bins_per_channel=fft_per_ch,
        window='hann', channel_count=nch,
    )
    np.testing.assert_allclose(
        np.asarray(power_s), np.asarray(power), rtol=1e-4
    )


@pytest.mark.parametrize('overlap_per_ch,bins_per_ch', [(0, 128), (64, 128), (64, 96)])
def test_sharded_channelize_power_overlap(mesh, overlap_per_ch, bins_per_ch):
    """sharded_channelize_power accepts the full single-device signature
    (VERDICT r2 #7): fft_overlap_per_channel and analysis-bin trims must
    match ops.spectral.channelize_power."""
    fs = 1e6
    nch = 4
    fft_per_ch = 128
    hop = (fft_per_ch - overlap_per_ch) * nch
    n = 8 * hop * 8
    x = make_tone_noise(n, fs=fs, f_tone=fs / 8, snr_db=40)
    xs = parallel.shard_time_axis(jnp.asarray(x), mesh)

    power_s = parallel.sharded_channelize_power(
        xs, mesh=mesh, Ts=1 / fs, fft_size_per_channel=fft_per_ch,
        analysis_bins_per_channel=bins_per_ch, window='hann',
        fft_overlap_per_channel=overlap_per_ch, channel_count=nch,
    )
    # single-device oracle on the zero-extended capture ('extend'
    # semantics: the sharded tail frames read zeros past the end)
    x_ext = np.concatenate([x, np.zeros(overlap_per_ch * nch, x.dtype)])
    _, _, power = fourier.channelize_power(
        x_ext, 1 / fs, fft_per_ch, analysis_bins_per_channel=bins_per_ch,
        window='hann', fft_overlap_per_channel=overlap_per_ch,
        channel_count=nch,
    )
    power = np.asarray(power)[: np.asarray(power_s).shape[0]]
    np.testing.assert_allclose(np.asarray(power_s), power, rtol=1e-4)


def test_sharded_psd_stats_quantile_statistics(mesh):
    """float entries in statistics= are quantiles, interleaved in order
    with named detectors (single-device signature parity, VERDICT r2 #7)."""
    fs = 1e6
    nperseg = 128
    n = 8 * nperseg * 32
    x = make_tone_noise(n, fs=fs)
    xs = parallel.shard_time_axis(jnp.asarray(x), mesh)

    stats, hist, edges = parallel.sharded_psd_stats(
        xs, mesh=mesh, fs=fs, window='hann', nperseg=nperseg,
        statistics=('max', 0.5, 'mean', 0.99),
    )
    assert stats.shape[0] == 4

    _, _, spg = fourier.spectrogram(x, fs=fs, window='hann', nperseg=nperseg)
    spg_dB = 10 * np.log10(np.asarray(spg) + 1e-25)
    bin_width = edges[1] - edges[0]

    np.testing.assert_allclose(np.asarray(stats[0]), spg_dB.max(axis=0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats[2]), spg_dB.mean(axis=0), atol=1e-3)

    # quantile rows are exactly the histogram inversion, in statistics order
    q_ref = np.asarray(
        parallel.quantile_from_histogram(hist, edges, jnp.asarray([0.5, 0.99]))
    )
    np.testing.assert_allclose(np.asarray(stats[1]), q_ref[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats[3]), q_ref[1], atol=1e-5)

    # and the median tracks the exact order statistic to bin resolution
    exact = np.quantile(spg_dB, 0.5, axis=0)
    assert np.abs(np.asarray(stats[1]) - exact).max() <= 2 * bin_width


@pytest.mark.parametrize('n_bins', [512, 2048])
def test_quantile_from_histogram_error_bound(n_bins):
    """histogram-inverted quantiles of real data stay within one bin
    width of the exact order-statistic quantiles at the production bin
    counts (VERDICT r1 item 9)."""
    rng = np.random.default_rng(7)
    # dB-like data: lognormal power in dB with a heavy lower tail
    vals = 10 * np.log10(rng.gamma(2.0, 1.0, size=200_000)).astype('float32')
    edges = np.linspace(-40.0, 20.0, n_bins + 1).astype('float32')
    bin_width = edges[1] - edges[0]

    idx = np.clip(np.searchsorted(edges, vals, side='right') - 1, 0, n_bins - 1)
    hist = np.zeros(n_bins, dtype='int64')
    np.add.at(hist, idx[(vals >= edges[0]) & (vals < edges[-1])], 1)

    qs = np.array([0.05, 0.25, 0.5, 0.9, 0.99, 0.999], dtype='float32')
    got = np.asarray(
        parallel.quantile_from_histogram(hist[None, :], edges, qs)
    )[:, 0]
    exact = np.quantile(vals, qs)
    assert np.abs(got - exact).max() <= bin_width, (got, exact)


@pytest.mark.parametrize(
    'mesh_shape',
    [(8,), (2, 4), (4, 2)],
    ids=['time8', 'batch2xtime4', 'batch4xtime2'],
)
def test_sharded_monitor_collective_budget(mesh_shape):
    """the sharded monitor step must scale: no all-gather or all-to-all
    of the capture may appear, only the O(noverlap) halo permutes and the
    O(bins) statistic reductions (VERDICT r1 item 8). The budget must be
    INVARIANT across mesh shapes — 1-D time meshes and asymmetric 2-D
    receiver-batch x time meshes, batch-major included (VERDICT r3 #7)."""
    import re

    from jax.sharding import NamedSharding, PartitionSpec as P

    from iqwaveform_tpu.models import (
        WidebandMonitor,
        design_wideband_monitor,
    )
    from iqwaveform_tpu.models.monitor import BATCH_AXIS
    from iqwaveform_tpu.parallel.mesh import TIME_AXIS

    design = design_wideband_monitor(
        61.44e6, 30.72e6, bw=20e6, channel_count=8,
        fft_size_per_channel=128, window='hamming', apd_bins=512,
    )
    if len(mesh_shape) == 1:
        axis_names = (TIME_AXIS,)
        n_batch, n_time = 1, mesh_shape[0]
    else:
        axis_names = (BATCH_AXIS, TIME_AXIS)
        n_batch, n_time = mesh_shape
    mesh = jax.make_mesh(
        mesh_shape,
        axis_names,
        axis_types=tuple(jax.sharding.AxisType.Auto for _ in axis_names),
    )
    mon = WidebandMonitor(design, mesh=mesh)
    n = mon.min_input_multiple(n_time)
    b = 2 * n_batch
    rng = np.random.default_rng(0)
    iq = (rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))).astype(
        'complex64'
    )
    iq = jax.device_put(
        jnp.asarray(iq),
        NamedSharding(
            mesh, P(BATCH_AXIS if n_batch > 1 else None, TIME_AXIS)
        ),
    )

    hlo = jax.jit(mon.sharded_step).lower(iq).compile().as_text()

    def count(op):
        return len(re.findall(rf'{op}\(|{op}-start', hlo))

    assert count('all-gather') == 0, 'capture-sized all-gather crept in'
    assert count('all-to-all') == 0
    assert count('collective-permute') <= 2  # halo in + OLA tail out
    assert count('all-reduce') <= 4  # psum/pmean/pmax statistic merges


def test_persistence_apd_fold_combined_matches_separate():
    """the single-pass combined fold (fused kernel emits detector-binned
    power alongside the levels) matches persistence_fold + apd_fold run
    separately, for both complex and (2, n) plane chunks."""
    from iqwaveform_tpu.parallel import streaming as S

    fs = 1e6
    nfft = 1024
    n = 1024 * 128
    navg = 16
    x = make_tone_noise(n, fs=fs)
    planes = jnp.asarray(np.stack([x.real, x.imag]).astype('float32'))
    apd_edges = (10 ** (np.linspace(-120.0, 30.0, 129) / 10.0)).astype(
        'float32'
    )
    design = S.design_persistence(
        nfft=nfft, window='hann', hist_bins=512, fft_backend='pallas'
    )

    init = S.persistence_init(design)
    apd0 = jnp.zeros((apd_edges.shape[0] + 1,), jnp.int32)

    # oracle: the separate folds on the complex chunk
    c_ref = S.persistence_fold(init, jnp.asarray(x), design)
    a_ref = S.apd_fold(apd0, jnp.asarray(x), edges=apd_edges, navg=navg)

    for chunk in (jnp.asarray(x), planes):
        c_got, a_got = S.persistence_apd_fold(
            init, apd0, chunk, design, apd_edges=apd_edges, apd_navg=navg
        )
        np.testing.assert_allclose(
            np.asarray(c_got.psum), np.asarray(c_ref.psum), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(c_got.hist), np.asarray(c_ref.hist)
        )
        # detector-binned counts: the in-kernel grouping dot reproduces
        # the XLA binned-mean matmul numerics (6-pass)
        np.testing.assert_array_equal(np.asarray(a_got), np.asarray(a_ref))

    # planes input to the plain persistence_fold matches complex input
    c_pl = S.persistence_fold(init, planes, design)
    np.testing.assert_array_equal(
        np.asarray(c_pl.hist), np.asarray(c_ref.hist)
    )


def test_persistence_apd_fold_fallback_path():
    """unsupported shapes (nfft < 1024) compose the separate folds."""
    from iqwaveform_tpu.parallel import streaming as S

    nfft = 256
    n = nfft * 64
    x = jnp.asarray(make_tone_noise(n))
    apd_edges = np.linspace(0.0, 4.0, 65).astype('float32')
    design = S.design_persistence(
        nfft=nfft, window='hann', hist_bins=128, fft_backend='mxu'
    )
    init = S.persistence_init(design)
    apd0 = jnp.zeros((apd_edges.shape[0] + 1,), jnp.int32)
    c_got, a_got = S.persistence_apd_fold(
        init, apd0, x, design, apd_edges=apd_edges, apd_navg=16
    )
    c_ref = S.persistence_fold(init, x, design)
    a_ref = S.apd_fold(apd0, x, edges=apd_edges, navg=16)
    np.testing.assert_array_equal(np.asarray(c_got.hist), np.asarray(c_ref.hist))
    np.testing.assert_array_equal(np.asarray(a_got), np.asarray(a_ref))


def test_persistence_stats_only_fused_kernel():
    """hist_bins=0 + pallas at nfft>=1024 engages the no-levels kernel
    variant; stats match the mxu factored path."""
    from iqwaveform_tpu.parallel import streaming as S

    nfft = 1024
    n = 1024 * 128
    x = make_tone_noise(n)
    planes = jnp.asarray(np.stack([x.real, x.imag]).astype('float32'))

    d_pal = S.design_persistence(
        nfft=nfft, window='hann', hist_bins=0, fft_backend='pallas'
    )
    assert S._fused_levels_fold(
        S.persistence_init(d_pal), planes, d_pal
    ) is not None

    c_pal = S.persistence_fold(S.persistence_init(d_pal), planes, d_pal)
    d_mxu = S.design_persistence(
        nfft=nfft, window='hann', hist_bins=0, fft_backend='mxu'
    )
    c_mxu = S.persistence_fold(
        S.persistence_init(d_mxu), jnp.asarray(x), d_mxu
    )
    assert c_pal.hist is None
    np.testing.assert_allclose(
        np.asarray(c_pal.psum), np.asarray(c_mxu.psum), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(c_pal.pmax), np.asarray(c_mxu.pmax), atol=1e-3
    )
    assert int(np.asarray(c_pal.count)) == n // nfft


def test_streaming_apd_planes_input():
    """(2, n) float plane input — the io.read_iq_planes layout apd_fold
    advertises — must chunk along the sample axis and match the complex
    path (regression: it mis-chunked along axis 0, returning zeros)."""
    x = make_tone_noise(100000)
    planes = jnp.stack([jnp.asarray(x.real), jnp.asarray(x.imag)])
    p = np.abs(x) ** 2
    edges = np.linspace(0, float(p.max()) * 1.01, 100).astype('float32')

    ref = parallel.streaming_apd(jnp.asarray(x), edges=edges, chunk_size=8192)
    got = parallel.streaming_apd(planes, edges=edges, chunk_size=8192)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert int(np.asarray(got).sum()) == x.shape[0]

    # detector-binned planes path (navg windows never span chunks)
    ref16 = parallel.streaming_apd(
        jnp.asarray(x), edges=edges, chunk_size=16 * 512, navg=16
    )
    got16 = parallel.streaming_apd(
        planes, edges=edges, chunk_size=16 * 512, navg=16
    )
    np.testing.assert_array_equal(np.asarray(got16), np.asarray(ref16))

    with pytest.raises(ValueError, match='planes'):
        parallel.streaming_apd(
            jnp.zeros((3, 100)), edges=edges, chunk_size=64
        )


def test_carry_checkpoint_path_and_structure_guards(tmp_path):
    """save/load agree on an extensionless path, and a structurally
    mismatched template fails loudly instead of mapping leaves onto the
    wrong fields."""
    from iqwaveform_tpu.parallel import streaming

    carry = streaming.PersistenceCarry(
        hist=jnp.arange(12, dtype=jnp.int32).reshape(3, 4) * (1 << 20),
        psum=jnp.ones(3),
        pmax=jnp.full(3, 2.0),
        pmin=jnp.full(3, -2.0),
        count=jnp.asarray(7, jnp.int32),
    )
    blank = jax.tree_util.tree_map(jnp.zeros_like, carry)

    # extensionless path: np.savez appends '.npz'; load must follow
    path = str(tmp_path / 'carry')
    streaming.save_carry(path, carry)
    restored = streaming.load_carry(path, blank)
    # int leaves round-trip exactly through the f32-only hi/lo channel
    np.testing.assert_array_equal(
        np.asarray(restored.hist), np.asarray(carry.hist)
    )
    np.testing.assert_array_equal(np.asarray(restored.count), 7)
    assert np.asarray(restored.hist).dtype == np.int32

    # a different pytree structure must be rejected
    with pytest.raises(ValueError, match='structure'):
        streaming.load_carry(path, {'a': jnp.zeros(3), 'b': jnp.zeros(3)})


def test_sharded_stft_rejects_shard_smaller_than_noverlap(mesh):
    """the halo reaches only the immediate right neighbor: a shard
    shorter than noverlap must fail loudly, not frame past the halo."""
    nperseg, noverlap = 256, 192
    hop = nperseg - noverlap
    x = make_tone_noise(8 * hop)  # shard = 64 < noverlap = 192
    with pytest.raises(ValueError, match='noverlap'):
        parallel.sharded_stft(
            jnp.asarray(x), mesh=mesh, window='hamming',
            nperseg=nperseg, noverlap=noverlap,
        )


def test_sharded_stft_rejects_invalid_norm(mesh):
    x = make_tone_noise(8 * 256)
    with pytest.raises(TypeError, match='norm'):
        parallel.sharded_stft(
            jnp.asarray(x), mesh=mesh, window='hamming', nperseg=256,
            norm='spectrum',
        )


def test_sharded_ola_filter_real_input_keeps_imag(mesh):
    """a real float32 input still produces a complex OLA stream; the
    overlap-add buffer must not silently truncate the imaginary part."""
    fs = 1e6
    nfft = 512
    n = 8 * (nfft // 2) * 16
    x = np.asarray(make_tone_noise(n, fs=fs).real, dtype='float32')

    ys = parallel.sharded_ola_filter(
        jnp.asarray(x), mesh=mesh, fs=fs, nfft=nfft, window='hamming',
        passband=(10e3, 2e5),  # asymmetric band -> complex output
    )
    assert np.iscomplexobj(np.asarray(ys))
    y = np.asarray(
        fourier.ola_filter(
            x, fs=fs, nfft=nfft, window='hamming', passband=(10e3, 2e5),
            extend=True,
        )
    )
    m = min(ys.shape[0], y.shape[0]) - nfft // 2
    np.testing.assert_allclose(np.asarray(ys)[:m], y[:m], atol=1e-4)
    assert np.abs(np.asarray(ys)[:m].imag).max() > 0


def test_sharded_ola_filter_upsample_offcenter_passband(mesh):
    """upsampling must re-center an off-center passband exactly like the
    single-device downsample_stft copy-range path."""
    fs = 1e6
    nfft, nfft_out = 256, 512
    n = 8 * (nfft // 2) * 16
    x = make_tone_noise(n, fs=fs, f_tone=200e3, snr_db=60)

    kws = dict(fs=fs, nfft=nfft, nfft_out=nfft_out, window='hamming',
               passband=(50e3, 450e3))
    ys = np.asarray(
        parallel.sharded_ola_filter(jnp.asarray(x), mesh=mesh, **kws)
    )
    y = np.asarray(fourier.ola_filter(x, extend=True, **kws))
    m = min(ys.shape[0], y.shape[0]) - nfft_out
    np.testing.assert_allclose(ys[:m], y[:m], atol=1e-4)


def test_streaming_apd_real_power_input():
    """1-D real input is already a power series (sample_ccdf semantics)
    and must be binned as-is, not squared."""
    rng = np.random.default_rng(0)
    p = rng.uniform(0, 2.0, 50000).astype('float32')
    edges = np.linspace(0, 2.1, 64).astype('float32')

    counts = parallel.streaming_apd(jnp.asarray(p), edges=edges, chunk_size=8192)
    ccdf = parallel.ccdf_from_counts(counts, p.shape[0])

    from iqwaveform_tpu import sample_ccdf

    expected = sample_ccdf(p, edges)
    np.testing.assert_allclose(np.asarray(ccdf), expected, atol=1e-6)


def test_streaming_persistence_folds_tail_frames():
    """whole frames beyond the last full chunk fold into the statistics
    instead of being silently dropped."""
    fs = 1e6
    nfft = 128
    chunk_frames = 64
    # 2 full chunks + 40 tail frames + a 17-sample sub-frame remainder
    n = nfft * (chunk_frames * 2 + 40) + 17
    x = make_tone_noise(n, fs=fs)

    res = parallel.streaming_persistence_spectrum(
        jnp.asarray(x), fs=fs, window='hann', nfft=nfft,
        chunk_frames=chunk_frames, quantiles=(0.5,),
    )

    n_frames = n // nfft
    freqs, times, spg = fourier.spectrogram(
        x[: n_frames * nfft], fs=fs, window='hann', nperseg=nfft
    )
    spg_dB = 10 * np.log10(np.asarray(spg) + 1e-25)
    assert spg_dB.shape[0] == n_frames
    np.testing.assert_allclose(
        np.asarray(res['mean_dB']), spg_dB.mean(axis=0), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res['max_dB']), spg_dB.max(axis=0), atol=1e-4
    )


def test_carry_checkpoint_wide_int_and_complex_leaves(tmp_path):
    """int64 leaves past 2^36 and complex64 leaves roundtrip exactly
    through the axon-safe float32 checkpoint channel."""
    from iqwaveform_tpu.parallel.streaming import load_carry, save_carry

    big = np.array([(1 << 45) + 12345, -(1 << 41) - 7, 3], dtype='int64')
    cplx = (np.arange(6, dtype='float32') - 2.5 + 1j * np.arange(6, dtype='float32')).astype('complex64')
    carry = {'counts': jnp.asarray(np.array([5, 1 << 20], 'int32')),
             'big': big,  # host leaf passes straight through
             'wave': jnp.asarray(cplx)}
    path = str(tmp_path / 'carry')
    save_carry(path, carry)
    back = load_carry(path, carry)
    np.testing.assert_array_equal(np.asarray(back['counts']), [5, 1 << 20])
    np.testing.assert_array_equal(np.asarray(back['big']), big)
    np.testing.assert_array_equal(np.asarray(back['wave']), cplx)
