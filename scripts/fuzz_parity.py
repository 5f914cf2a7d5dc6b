"""Randomized dual-path / scipy-oracle fuzzing.

Every public entry point accepts numpy (host, scipy-matched) or jax
arrays (device path, traceable); this harness drives both paths with
randomized shapes/axes/parameters and checks they agree (and, where an
exact scipy counterpart exists, that the host path matches scipy).

Usage: python scripts/fuzz_parity.py [N_CASES] [SEED]

Runs on the virtual CPU mesh (never touches the TPU tunnel). Exits
nonzero on the first 20 failures with reproduction parameters printed.
"""

import os
import sys
import traceback
import zlib

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import scipy.signal


def _agree(name, params, a, b, rtol=2e-5, atol=1e-5):
    a = np.asarray(a)
    b = np.asarray(b)
    if a.shape != b.shape:
        raise AssertionError(f'{name} {params}: shape {a.shape} vs {b.shape}')
    scale = max(np.abs(a).max(), 1e-30)
    err = np.abs(a - b).max() / scale
    if not np.isfinite(a).all() == np.isfinite(b).all() or err > max(
        rtol, atol / scale
    ):
        raise AssertionError(f'{name} {params}: rel err {err:.3e}')


def fuzz_stft(rng):
    from iqwaveform_tpu import fourier

    nperseg = int(rng.choice([64, 96, 128, 256]))
    frac = rng.choice([0.0, 0.5])
    noverlap = int(nperseg * frac)
    window = str(rng.choice(['hamming', 'hann', 'blackman']))
    nblocks = int(rng.integers(2, 6))
    n = nperseg * nblocks
    ndim = int(rng.integers(1, 3))
    axis = int(rng.integers(0, ndim))
    shape = [int(rng.integers(1, 3)) for _ in range(ndim)]
    shape[axis] = n
    norm = rng.choice([None, 'power'])
    x = (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype('complex64')
    params = dict(
        nperseg=nperseg, noverlap=noverlap, window=window, shape=shape,
        axis=axis, norm=norm,
    )
    _, _, got_np = fourier.stft(
        x, fs=1.0, window=window, nperseg=nperseg, noverlap=noverlap,
        axis=axis, norm=None if norm is None else str(norm),
    )
    _, _, got_jx = fourier.stft(
        jnp.asarray(x), fs=1.0, window=window, nperseg=nperseg,
        noverlap=noverlap, axis=axis, norm=None if norm is None else str(norm),
    )
    _agree('stft', params, got_np, got_jx)


def fuzz_resample(rng):
    from iqwaveform_tpu import fourier

    n_in = int(rng.integers(16, 400))
    n_out = int(rng.integers(8, 400))
    ndim = int(rng.integers(1, 3))
    axis = int(rng.integers(0, ndim))
    shape = [int(rng.integers(1, 4)) for _ in range(ndim)]
    shape[axis] = n_in
    x = (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype('complex64')
    params = dict(n_in=n_in, n_out=n_out, shape=shape, axis=axis)
    got_np = fourier.resample(x, n_out, axis=axis)
    got_jx = fourier.resample(jnp.asarray(x), n_out, axis=axis)
    _agree('resample', params, got_np, got_jx, rtol=5e-5)
    if n_in % 2 == 0 and n_out % 2 == 0 and n_out > 8:
        # documented deviation (tests/test_filtering.py:42-44): the
        # band-edge bin is sliced, not folded as scipy does, so compare
        # spectra away from the two edge bins
        ref = scipy.signal.resample(x.astype('complex128'), n_out, axis=axis)
        F_ref = np.fft.fftshift(np.fft.fft(ref, axis=axis), axes=axis)
        F_got = np.fft.fftshift(np.fft.fft(got_np, axis=axis), axes=axis)
        keep = np.ones(n_out, bool)
        if n_out > n_in:
            # upsampling: the deviation sits at the original band's
            # edge bins inside the zero-padded output
            pad = (n_out - n_in) // 2
            keep[[pad, pad + n_in]] = False
        else:
            keep[:2] = keep[-2:] = False
        F_ref = np.compress(keep, F_ref, axis=axis)
        F_got = np.compress(keep, F_got, axis=axis)
        _agree('resample-vs-scipy', params, F_ref, F_got, rtol=2e-4)


def fuzz_upfirdn(rng):
    from iqwaveform_tpu import fourier

    up = int(rng.integers(1, 6))
    down = int(rng.integers(1, 6))
    hlen = int(rng.integers(1, 33))
    n = int(rng.integers(max(hlen, 8), 256))
    ndim = int(rng.integers(1, 3))
    axis = int(rng.integers(0, ndim))
    shape = [int(rng.integers(1, 4)) for _ in range(ndim)]
    shape[axis] = n
    cplx = bool(rng.integers(0, 2))
    h = rng.standard_normal(hlen).astype('float32')
    x = rng.standard_normal(shape).astype('float32')
    if cplx:
        x = (x + 1j * rng.standard_normal(shape).astype('float32')).astype(
            'complex64'
        )
    params = dict(up=up, down=down, hlen=hlen, shape=shape, axis=axis, cplx=cplx)
    ref = scipy.signal.upfirdn(
        h.astype('float64'), x.astype('complex128' if cplx else 'float64'),
        up=up, down=down, axis=axis,
    )
    got_np = fourier.upfirdn(h, x, up=up, down=down, axis=axis)
    _agree('upfirdn-np', params, ref, got_np, rtol=1e-4)
    got_jx = fourier.upfirdn(h, jnp.asarray(x), up=up, down=down, axis=axis)
    _agree('upfirdn-jx', params, ref, got_jx, rtol=1e-4)


def fuzz_power_ops(rng):
    from iqwaveform_tpu import power_analysis as pa

    ndim = int(rng.integers(1, 4))
    shape = [int(rng.integers(1, 9)) for _ in range(ndim)]
    x = (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype('complex64')
    p = (np.abs(x) ** 2).astype('float32') + 1e-12
    params = dict(shape=shape)
    for fn, arg in [
        (pa.envtopow, x), (pa.envtodB, x), (pa.powtodB, p), (pa.dBtopow, p)
    ]:
        got_np = fn(arg)
        got_jx = fn(jnp.asarray(arg))
        _agree(fn.__name__, params, got_np, got_jx)


def fuzz_bin_power(rng):
    from iqwaveform_tpu import power_analysis as pa

    nbin = int(rng.integers(2, 17))
    nblocks = int(rng.integers(2, 33))
    n = nbin * nblocks
    Ts = 1e-6
    detector = str(rng.choice(['mean', 'max', 'rms', 'min', 'peak']))
    x = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype('complex64')
    params = dict(nbin=nbin, nblocks=nblocks, detector=detector)
    got_np = pa.iq_to_bin_power(x, Ts=Ts, Tbin=nbin * Ts, kind=detector)
    got_jx = pa.iq_to_bin_power(jnp.asarray(x), Ts=Ts, Tbin=nbin * Ts, kind=detector)
    _agree('iq_to_bin_power', params, got_np, got_jx)


def fuzz_ccdf(rng):
    from iqwaveform_tpu import power_analysis as pa

    n = int(rng.integers(16, 2048))
    nedges = int(rng.integers(4, 64))
    x = np.abs(rng.standard_normal(n)).astype('float32') + 1e-6
    edges = np.linspace(0, float(x.max()) * 1.1, nedges).astype('float32')
    params = dict(n=n, nedges=nedges)
    got_np = pa.sample_ccdf(x, edges)
    got_jx = pa.sample_ccdf(jnp.asarray(x), jnp.asarray(edges))
    oracle = (x[None, :] > edges[:, None]).sum(axis=1) / n
    _agree('sample_ccdf-np', params, oracle, got_np, rtol=0, atol=1e-7)
    _agree('sample_ccdf-jx', params, oracle, got_jx, rtol=0, atol=1e-7)


def fuzz_histogram_last_axis(rng):
    from iqwaveform_tpu import util

    rows = int(rng.integers(1, 9))
    n = int(rng.integers(8, 300))
    nbins = int(rng.integers(2, 40))
    x = rng.standard_normal((rows, n)).astype('float32')
    edges = np.linspace(-3, 3, nbins + 1)
    params = dict(rows=rows, n=n, nbins=nbins)
    got, _ = util.histogram_last_axis(x, edges)
    oracle = np.stack([np.histogram(r, edges)[0] for r in x])
    _agree('histogram_last_axis', params, oracle, got, rtol=0, atol=0)


def fuzz_framing(rng):
    from iqwaveform_tpu import util

    n = int(rng.integers(8, 300))
    size = int(rng.integers(1, 16))
    ndim = int(rng.integers(1, 3))
    axis = int(rng.integers(0, ndim))
    shape = [int(rng.integers(1, 4)) for _ in range(ndim)]
    shape[axis] = (n // size) * size if n >= size else size
    x = rng.standard_normal(shape).astype('float32')
    params = dict(shape=shape, size=size, axis=axis)
    got = util.to_blocks(x, size, axis=axis)
    got_jx = util.to_blocks(jnp.asarray(x), size, axis=axis)
    _agree('to_blocks', params, got, got_jx, rtol=0, atol=0)

    wlen = int(rng.integers(1, max(2, shape[axis] // 2 + 1)))
    got = util.sliding_window_view(x, wlen, axis=axis)
    oracle = np.lib.stride_tricks.sliding_window_view(x, wlen, axis=axis)
    if got.shape != oracle.shape:
        # axis placement conventions can differ; compare via moveaxis
        raise AssertionError(f'sliding_window_view {params}: {got.shape} vs {oracle.shape}')
    _agree('sliding_window_view', params, oracle, got, rtol=0, atol=0)


def fuzz_ola_filter(rng):
    from iqwaveform_tpu import fourier

    window, divisor = rng.choice(
        [('hamming', 2), ('blackman', 3), ('blackmanharris', 5)], axis=0
    )
    divisor = int(divisor)
    window = str(window)
    # COLA needs nfft divisible by the window's overlap divisor, and the
    # input a whole number of noverlap spans: hamming overlaps 1/2,
    # blackman 2/3, blackmanharris 4/5 -> nblocks multiples of 1/2/4
    nfft = divisor * int(rng.choice([32, 64, 128]))
    block_quantum = {2: 1, 3: 2, 5: 4}[divisor]
    nblocks = block_quantum * int(rng.integers(1, 4)) + block_quantum
    n = nfft * nblocks
    fs = 1e6
    lo = rng.uniform(-0.3, -0.05) * fs
    hi = rng.uniform(0.05, 0.3) * fs
    x = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype('complex64')
    params = dict(window=window, nfft=nfft, n=n, passband=(lo, hi))
    got_np = fourier.ola_filter(
        x, fs=fs, nfft=nfft, window=window, passband=(lo, hi)
    )
    got_jx = fourier.ola_filter(
        jnp.asarray(x), fs=fs, nfft=nfft, window=window, passband=(lo, hi)
    )
    _agree('ola_filter', params, got_np, got_jx, rtol=5e-5)


def fuzz_istft_roundtrip(rng):
    from iqwaveform_tpu import fourier

    window, divisor = rng.choice(
        [('hamming', 2), ('blackman', 3), ('blackmanharris', 5)], axis=0
    )
    divisor = int(divisor)
    window = str(window)
    nperseg = divisor * int(rng.choice([16, 32, 64]))
    overlap_frac = {2: 0.5, 3: 2 / 3, 5: 0.8}[divisor]
    noverlap = round(nperseg * overlap_frac)
    block_quantum = {2: 1, 3: 2, 5: 4}[divisor]
    # >= 3 blocks so the full-overlap interior is non-empty
    nblocks = max(3, block_quantum * int(rng.integers(2, 5)))
    n = nperseg * nblocks
    x = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype('complex64')
    params = dict(window=window, nperseg=nperseg, noverlap=noverlap, n=n)
    Y = fourier.stft(
        x, fs=1.0, window=window, nperseg=nperseg, noverlap=noverlap,
        truncate=False, return_axis_arrays=False,
    )
    y = np.asarray(fourier.istft(Y, nfft=nperseg, noverlap=noverlap))
    # COLA roundtrip reconstructs the interior exactly (edges lack full
    # overlap coverage)
    m = min(n, y.shape[0])
    interior = slice(nperseg, m - nperseg)
    _agree('istft-roundtrip', params, x[interior], y[interior], rtol=2e-4)
    Yj = fourier.stft(
        jnp.asarray(x), fs=1.0, window=window, nperseg=nperseg,
        noverlap=noverlap, truncate=False, return_axis_arrays=False,
    )
    yj = np.asarray(fourier.istft(Yj, nfft=nperseg, noverlap=noverlap))
    _agree('istft-roundtrip-jx', params, y, yj, rtol=5e-5)


def fuzz_psd(rng):
    from iqwaveform_tpu import fourier

    nperseg = int(rng.choice([64, 128, 256]))
    nblocks = int(rng.integers(4, 10))
    n = nperseg * nblocks
    fs = float(nperseg)  # resolution=1 -> nperseg bins
    stats = [0.5, 'mean', 'max'] if rng.integers(0, 2) else ['min', 0.9, 'rms']
    x = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype('complex64')
    params = dict(nperseg=nperseg, n=n, stats=stats)
    got_np = fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=1.0, statistics=stats
    )
    got_jx = fourier.power_spectral_density(
        jnp.asarray(x), fs=fs, window='hann', resolution=1.0, statistics=stats
    )
    _agree('power_spectral_density', params, got_np, got_jx, rtol=1e-4)


def fuzz_channelize(rng):
    from iqwaveform_tpu import fourier

    fft_per_chan = int(rng.choice([16, 32, 64]))
    n_chan = int(rng.choice([4, 8]))
    analysis = fft_per_chan - 2 * int(rng.integers(0, fft_per_chan // 4))
    nblocks = int(rng.integers(2, 6))
    n = fft_per_chan * n_chan * nblocks
    x = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype('complex64')
    params = dict(
        fft_per_chan=fft_per_chan, n_chan=n_chan, analysis=analysis, n=n
    )
    got_np = fourier.channelize_power(
        x, 1e-6, fft_per_chan, analysis_bins_per_channel=analysis,
        window='hamming', channel_count=n_chan,
    )
    got_jx = fourier.channelize_power(
        jnp.asarray(x), 1e-6, fft_per_chan,
        analysis_bins_per_channel=analysis, window='hamming',
        channel_count=n_chan,
    )
    _agree('channelize_power', params, got_np[2], got_jx[2], rtol=1e-4)


def fuzz_cyclic_power(rng):
    from iqwaveform_tpu import power_analysis as pa

    Ts = 1e-6
    nbin = int(rng.integers(2, 9))
    bins_per_cycle = int(rng.integers(2, 6))
    cycles = int(rng.integers(2, 8))
    n = nbin * bins_per_cycle * cycles
    x = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype('complex64')
    params = dict(nbin=nbin, bins_per_cycle=bins_per_cycle, cycles=cycles)
    kws = dict(
        Ts=Ts,
        detector_period=nbin * Ts,
        cyclic_period=nbin * bins_per_cycle * Ts,
    )
    got_np = pa.iq_to_cyclic_power(x, **kws)
    got_jx = pa.iq_to_cyclic_power(jnp.asarray(x), **kws)
    for det in got_np:
        for stat in got_np[det]:
            _agree(
                f'iq_to_cyclic_power[{det}][{stat}]', params,
                got_np[det][stat], got_jx[det][stat],
            )


_MESH = None


def _mesh():
    global _MESH
    if _MESH is None:
        from iqwaveform_tpu import parallel

        _MESH = parallel.time_mesh(8)
    return _MESH


def fuzz_streaming_persistence(rng):
    """streaming scan fold vs the one-shot spectrogram statistics."""
    from iqwaveform_tpu import fourier, parallel

    fs = 1e6
    nfft = int(rng.choice([64, 128, 256]))
    chunk_frames = int(rng.choice([16, 32]))
    nchunks = int(rng.integers(2, 5))
    n = nfft * chunk_frames * nchunks
    hist_bins = int(rng.choice([1024, 2048]))
    q = float(rng.choice([0.25, 0.5, 0.9]))
    window = str(rng.choice(['hann', 'hamming']))
    x = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype('complex64')
    params = dict(
        nfft=nfft, chunk_frames=chunk_frames, nchunks=nchunks,
        hist_bins=hist_bins, q=q, window=window,
    )
    res = parallel.streaming_persistence_spectrum(
        jnp.asarray(x), fs=fs, window=window, nfft=nfft,
        chunk_frames=chunk_frames, quantiles=(q,), hist_bins=hist_bins,
    )
    _, _, spg = fourier.spectrogram(x, fs=fs, window=window, nperseg=nfft)
    spg_dB = 10 * np.log10(np.asarray(spg) + 1e-25)
    _agree('streaming[mean_dB]', params, spg_dB.mean(axis=0), res['mean_dB'], rtol=2e-4)
    _agree('streaming[max_dB]', params, spg_dB.max(axis=0), res['max_dB'], rtol=2e-5)
    # histogram inversion picks a bin edge between the bracketing order
    # statistics; np.quantile interpolates. At low frame counts the gap
    # between adjacent order statistics dwarfs the bin width, so bound
    # with the exact lower/higher order-statistic envelope +- one bin.
    bw = float(res['hist_edges_dB'][1] - res['hist_edges_dB'][0])
    lo_env = np.quantile(spg_dB, q, axis=0, method='lower') - bw
    hi_env = np.quantile(spg_dB, q, axis=0, method='higher') + bw
    got_q = np.asarray(res['quantiles_dB'])[0]
    bad = (got_q < lo_env) | (got_q > hi_env)
    if bad.any():
        worst = np.maximum(lo_env - got_q, got_q - hi_env).max()
        raise AssertionError(
            f'streaming[quantile] {params}: {bad.sum()} bins outside the '
            f'order-statistic envelope (worst {worst:.3f} dB)'
        )


def fuzz_exact_quantiles(rng):
    """streaming exact-quantile refinement vs np.quantile of the
    one-shot spectrogram (round 4): the refinement returns true order
    statistics of its own chunked transform, so agreement with the
    independently-compiled oracle is at the float32-ulp level — far
    inside the histogram inversion's bin-width error."""
    from iqwaveform_tpu import fourier
    from iqwaveform_tpu.parallel import streaming as S

    fs = 1e6
    nfft = int(rng.choice([64, 128, 256]))
    chunk_frames = int(rng.choice([16, 32]))
    nchunks = int(rng.integers(2, 5))
    tail_frames = int(rng.integers(0, 3))
    n = nfft * (chunk_frames * nchunks + tail_frames)
    hist_bins = int(rng.choice([128, 512]))
    qs = sorted(rng.choice([0.1, 0.25, 0.5, 0.9, 0.99], size=2, replace=False))
    window = str(rng.choice(['hann', 'hamming']))
    backend = str(rng.choice(['mxu', 'xla']))
    narrowed = bool(rng.integers(0, 2))
    x = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype('complex64')
    params = dict(
        nfft=nfft, chunk_frames=chunk_frames, nchunks=nchunks,
        tail_frames=tail_frames, hist_bins=hist_bins, qs=qs,
        window=window, backend=backend, narrowed=narrowed,
    )
    c_direct = S._C_DIRECT
    if narrowed:
        S._C_DIRECT = 8
    try:
        res = S.streaming_persistence_spectrum(
            jnp.asarray(x), fs=fs, window=window, nfft=nfft,
            chunk_frames=chunk_frames, quantiles=tuple(qs),
            hist_bins=hist_bins, fft_backend=backend,
            fft_precision='highest', exact_quantiles=True,
        )
    finally:
        S._C_DIRECT = c_direct
    assert res.get('quantiles_exact') is True, params
    _, _, spg = fourier.spectrogram(x, fs=fs, window=window, nperseg=nfft)
    spg_dB = 10 * np.log10(np.asarray(spg) + 1e-25)
    oracle = np.quantile(spg_dB.astype('float32'), qs, axis=0).astype(
        'float32'
    )
    _agree(
        'exact_quantiles', params, oracle, res['quantiles_dB'],
        rtol=0.0, atol=1e-3,
    )


def fuzz_sharded_exact_quantiles(rng):
    """sharded_psd_stats(exact_quantiles=True) vs np.quantile of the
    gathered spectrogram on the virtual mesh (round 4)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from iqwaveform_tpu.ops.window_design import get_window
    from iqwaveform_tpu.parallel import sharded as sh
    from iqwaveform_tpu.parallel.mesh import TIME_AXIS, time_mesh

    mesh = time_mesh()
    n_dev = mesh.shape[TIME_AXIS]
    nperseg = int(rng.choice([64, 128]))
    hop_frames = int(rng.integers(4, 9))
    noverlap = int(rng.choice([0, nperseg // 2]))
    hop = nperseg - noverlap
    n = n_dev * hop * hop_frames * 4
    qs = sorted(rng.choice([0.1, 0.5, 0.9], size=2, replace=False))
    window = str(rng.choice(['hann', 'hamming']))
    x = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype('complex64')
    params = dict(
        nperseg=nperseg, noverlap=noverlap, n=n, qs=qs, window=window
    )
    xd = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(TIME_AXIS))
    )
    stats, hist, edges = sh.sharded_psd_stats(
        xd, mesh=mesh, fs=1e6, window=window, nperseg=nperseg,
        noverlap=noverlap, statistics=tuple(qs), hist_bins=256,
        exact_quantiles=True,
    )
    w = get_window(
        window, nperseg, xp=np, dtype='complex64', norm=True,
        fftshift=True,
    )

    def body(xl):
        spg = sh._sharded_stft_local(
            xl, w=w, nperseg=nperseg, noverlap=noverlap, norm='power',
            axis_name=TIME_AXIS,
        )
        spg = spg.real * spg.real + spg.imag * spg.imag
        return 10.0 * jnp.log10(spg + 1e-25)

    spg_all = np.asarray(
        jax.shard_map(
            body, mesh=mesh, in_specs=P(TIME_AXIS), out_specs=P(TIME_AXIS)
        )(xd)
    )
    oracle = np.quantile(spg_all, qs, axis=0).astype('float32')
    _agree(
        'sharded_exact_quantiles', params, oracle, np.asarray(stats),
        rtol=0.0, atol=1e-3,
    )


def fuzz_streaming_apd(rng):
    from iqwaveform_tpu import parallel

    navg = int(rng.choice([1, 4, 16]))
    chunk = navg * int(rng.choice([256, 512]))
    n = chunk * int(rng.integers(2, 6)) + navg * int(rng.integers(0, 32))
    nedges = int(rng.integers(8, 128))
    x = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype('complex64')
    p = (np.abs(x) ** 2).astype('float32')
    p_det = p[: (n // navg) * navg].reshape(-1, navg).mean(axis=1)
    edges = np.linspace(0, float(p.max()) * 1.01, nedges).astype('float32')
    params = dict(navg=navg, chunk=chunk, n=n, nedges=nedges)
    counts = np.asarray(
        parallel.streaming_apd(
            jnp.asarray(x), edges=edges, chunk_size=chunk, navg=navg
        )
    )
    expected = np.bincount(
        np.searchsorted(edges, p_det, side='left'), minlength=nedges + 1
    )
    if counts.sum() != expected.sum():
        raise AssertionError(f'streaming_apd {params}: totals differ')
    cum = np.abs(np.cumsum(counts) - np.cumsum(expected)).max()
    if cum > 1:
        raise AssertionError(f'streaming_apd {params}: cum delta {cum}')


def fuzz_streaming_tail(rng):
    """non-chunk-multiple captures: whole tail frames past the last full
    chunk must fold into the statistics (only the sub-frame remainder is
    dropped)."""
    from iqwaveform_tpu import fourier, parallel

    fs = 1e6
    nfft = int(rng.choice([64, 128]))
    chunk_frames = int(rng.choice([16, 32]))
    nchunks = int(rng.integers(1, 4))
    tail_frames = int(rng.integers(1, chunk_frames))
    sub_frame = int(rng.integers(0, nfft))
    n = nfft * (chunk_frames * nchunks + tail_frames) + sub_frame
    window = str(rng.choice(['hann', 'hamming']))
    x = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype('complex64')
    params = dict(
        nfft=nfft, chunk_frames=chunk_frames, nchunks=nchunks,
        tail_frames=tail_frames, sub_frame=sub_frame, window=window,
    )
    res = parallel.streaming_persistence_spectrum(
        jnp.asarray(x), fs=fs, window=window, nfft=nfft,
        chunk_frames=chunk_frames, quantiles=(0.5,),
    )
    n_frames = n // nfft
    _, _, spg = fourier.spectrogram(
        x[: n_frames * nfft], fs=fs, window=window, nperseg=nfft
    )
    spg_dB = 10 * np.log10(np.asarray(spg) + 1e-25)
    if spg_dB.shape[0] != n_frames:
        raise AssertionError(f'streaming_tail {params}: oracle framing')
    _agree(
        'streaming_tail[mean_dB]', params, spg_dB.mean(axis=0),
        res['mean_dB'], rtol=2e-4,
    )
    _agree(
        'streaming_tail[max_dB]', params, spg_dB.max(axis=0),
        res['max_dB'], rtol=2e-5,
    )


def fuzz_carry_checkpoint(rng):
    """save_carry/load_carry roundtrip random pytrees exactly through the
    axon-safe float32 channel, mirroring each leaf's host/device placement."""
    import tempfile

    from iqwaveform_tpu import parallel

    def _leaf(kind):
        shape = tuple(rng.integers(1, 5, size=int(rng.integers(1, 3))))
        if kind == 'int32':
            v = rng.integers(-(2**31), 2**31, size=shape, dtype='int64')
            return v.astype('int32')
        if kind == 'int64':
            return rng.integers(-(2**62), 2**62, size=shape, dtype='int64')
        if kind == 'float32':
            return rng.standard_normal(shape).astype('float32') * 10.0 ** int(
                rng.integers(-20, 20)
            )
        if kind == 'float64':
            return rng.standard_normal(shape)
        re = rng.standard_normal(shape).astype('float32')
        im = rng.standard_normal(shape).astype('float32')
        return (re + 1j * im).astype('complex64')

    # int64/float64 leaves stay host-side (device placement would narrow
    # them under default x64-off before save_carry ever sees the values)
    device_ok = {'int32', 'float32', 'complex64'}
    kinds = ['int32', 'int64', 'float32', 'float64', 'complex64']
    carry = {}
    placements = {}
    for i in range(int(rng.integers(2, 6))):
        kind = str(rng.choice(kinds))
        host = kind not in device_ok or bool(rng.integers(0, 2))
        v = _leaf(kind)
        carry[f'leaf{i}_{kind}'] = v if host else jnp.asarray(v)
        placements[f'leaf{i}_{kind}'] = 'host' if host else 'device'
    params = dict(placements=placements)

    with tempfile.TemporaryDirectory() as d:
        path = d + '/carry'
        parallel.save_carry(path, carry)
        back = parallel.load_carry(path, carry)
    for name, v in carry.items():
        got = back[name]
        want_jax = placements[name] == 'device'
        if isinstance(got, np.ndarray) == want_jax:
            raise AssertionError(
                f'carry_checkpoint {params}: {name} placement not mirrored'
            )
        if np.asarray(got).dtype != np.asarray(v).dtype:
            raise AssertionError(
                f'carry_checkpoint {params}: {name} dtype '
                f'{np.asarray(got).dtype} != {np.asarray(v).dtype}'
            )
        if not np.array_equal(np.asarray(got), np.asarray(v)):
            raise AssertionError(
                f'carry_checkpoint {params}: {name} values differ'
            )


def fuzz_sharded_stft(rng):
    from iqwaveform_tpu import fourier, parallel

    nperseg = int(rng.choice([128, 256]))
    overlap = bool(rng.integers(0, 2))
    noverlap = nperseg // 2 if overlap else 0
    hop = nperseg - noverlap
    n = 8 * hop * int(rng.integers(8, 33))
    window = str(rng.choice(['hamming', 'hann']))
    x = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype('complex64')
    params = dict(nperseg=nperseg, noverlap=noverlap, n=n, window=window)
    xs = parallel.shard_time_axis(jnp.asarray(x), _mesh())
    Ys = parallel.sharded_stft(
        xs, mesh=_mesh(), window=window, nperseg=nperseg, noverlap=noverlap
    )
    x_ext = np.concatenate([x, np.zeros(noverlap, x.dtype)]) if noverlap else x
    Y = fourier.stft(
        x_ext, fs=1e6, window=window, nperseg=nperseg, noverlap=noverlap,
        return_axis_arrays=False,
    )
    _agree('sharded_stft', params, np.asarray(Y), np.asarray(Ys), rtol=1e-5)


def fuzz_sharded_channelize(rng):
    from iqwaveform_tpu import fourier, parallel

    fs = 1e6
    nch = int(rng.choice([2, 4, 8]))
    fft_per_ch = int(rng.choice([64, 128]))
    overlap = int(rng.choice([0, fft_per_ch // 2]))
    bins = fft_per_ch - 2 * int(rng.integers(0, fft_per_ch // 8))
    hop = (fft_per_ch - overlap) * nch
    n = 8 * hop * int(rng.integers(4, 9))
    x = (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    ).astype('complex64')
    params = dict(nch=nch, fft_per_ch=fft_per_ch, overlap=overlap, bins=bins, n=n)
    xs = parallel.shard_time_axis(jnp.asarray(x), _mesh())
    power_s = parallel.sharded_channelize_power(
        xs, mesh=_mesh(), Ts=1 / fs, fft_size_per_channel=fft_per_ch,
        analysis_bins_per_channel=bins, window='hann',
        fft_overlap_per_channel=overlap, channel_count=nch,
    )
    x_ext = (
        np.concatenate([x, np.zeros(overlap * nch, x.dtype)]) if overlap else x
    )
    _, _, power = fourier.channelize_power(
        x_ext, 1 / fs, fft_per_ch, analysis_bins_per_channel=bins,
        window='hann', fft_overlap_per_channel=overlap, channel_count=nch,
    )
    power = np.asarray(power)[: np.asarray(power_s).shape[0]]
    _agree('sharded_channelize', params, power, np.asarray(power_s), rtol=1e-4)


FUZZERS = [
    fuzz_stft,
    fuzz_resample,
    fuzz_upfirdn,
    fuzz_power_ops,
    fuzz_bin_power,
    fuzz_ccdf,
    fuzz_histogram_last_axis,
    fuzz_framing,
    fuzz_ola_filter,
    fuzz_istft_roundtrip,
    fuzz_psd,
    fuzz_channelize,
    fuzz_cyclic_power,
    fuzz_streaming_persistence,
    fuzz_exact_quantiles,
    fuzz_sharded_exact_quantiles,
    fuzz_streaming_apd,
    fuzz_streaming_tail,
    fuzz_carry_checkpoint,
    fuzz_sharded_stft,
    fuzz_sharded_channelize,
]


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    failures = []
    for i in range(n_cases):
        for fz in FUZZERS:
            # zlib.crc32, not hash(): str hashes are salted per process,
            # which would make failures irreproducible
            rng = np.random.default_rng(
                seed * 1_000_003
                + i * 997
                + zlib.crc32(fz.__name__.encode()) % 65536
            )
            try:
                fz(rng)
            except AssertionError as err:
                failures.append(f'[case {i}] {err}')
                print(failures[-1], flush=True)
            except Exception:
                failures.append(f'[case {i}] {fz.__name__} CRASH:\n' + traceback.format_exc(limit=8))
                print(failures[-1], flush=True)
            if len(failures) >= 20:
                print(f'stopping after {len(failures)} failures')
                sys.exit(1)
        if (i + 1) % 10 == 0:
            print(f'{i + 1}/{n_cases} cases x {len(FUZZERS)} fuzzers ok so far', flush=True)
    if failures:
        sys.exit(1)
    print(f'fuzz parity: {n_cases} cases x {len(FUZZERS)} fuzzers all passed')


if __name__ == '__main__':
    main()
