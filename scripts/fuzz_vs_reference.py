"""Randomized numeric parity fuzz against the ACTUAL reference package.

scripts/fuzz_parity.py checks our numpy path against our jax path and
scipy oracles. This harness goes one step further: it imports the real
reference package (via scripts/_refload.py functional dependency
emulations) and drives the reference's numpy code paths and ours with
identical inputs, comparing numbers directly.

Reference entry points that crash as released (documented in
docs/PARITY.md "Reference bugs intentionally not reproduced") are
compared against hand-built oracles over the reference's *working*
internals instead — e.g. `power_spectral_density` (reference
fourier.py:1318 writes the quantile block transposed) is checked
against reference `spectrogram` + explicit statistics.

Usage: python scripts/fuzz_vs_reference.py [N_CASES] [SEED]

Runs host-only (never touches the TPU tunnel).
"""

import os
import sys
import traceback
import zlib

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _refload

REF = _refload.load_reference()
REF_OFDM = sys.modules['iqwaveform.ofdm']

REF_WINDOWS = sys.modules['iqwaveform.windows']

import iqwaveform_tpu as OURS
from iqwaveform_tpu import ofdm as OURS_OFDM
from iqwaveform_tpu import power_analysis as OURS_PA
from iqwaveform_tpu import windows as OURS_WINDOWS


def _agree(name, params, ref, got, rtol=2e-6, atol=1e-7):
    ref = np.asarray(ref)
    got = np.asarray(got)
    if ref.shape != got.shape:
        raise AssertionError(f'{name} {params}: shape {ref.shape} vs {got.shape}')
    if ref.size == 0:
        return
    finite = np.isfinite(ref)
    if not np.array_equal(finite, np.isfinite(got)):
        raise AssertionError(f'{name} {params}: finite-mask mismatch')
    scale = max(np.abs(ref[finite]).max() if finite.any() else 0.0, 1e-30)
    err = (
        np.abs(ref[finite] - got[finite]).max() / scale if finite.any() else 0.0
    )
    if err > max(rtol, atol / scale):
        raise AssertionError(f'{name} {params}: rel err {err:.3e}')


def _iq(rng, shape):
    return (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ).astype('complex64')


def fuzz_db_transforms(rng):
    ndim = int(rng.integers(1, 3))
    shape = [int(rng.integers(1, 64)) for _ in range(ndim)]
    x = _iq(rng, shape)
    p = (np.abs(x) ** 2).astype('float32') + 1e-12
    eps = float(rng.choice([0.0, 1e-25]))
    params = dict(shape=shape, eps=eps)
    for fname, arg, kws in [
        ('envtodB', x, dict(eps=eps)),
        ('powtodB', p, dict(eps=eps)),
        ('envtopow', x, {}),
        ('dBtopow', p, {}),
    ]:
        ref_fn = getattr(REF.power_analysis, fname)
        our_fn = getattr(OURS_PA, fname)
        _agree(fname, params, ref_fn(arg.copy(), **kws), our_fn(arg.copy(), **kws))
    # the out= buffer contract (reference power_analysis.py:182,220)
    out_ref = np.empty_like(p)
    out_our = np.empty_like(p)
    r = REF.power_analysis.powtodB(p.copy(), out=out_ref)
    g = OURS_PA.powtodB(p.copy(), out=out_our)
    _agree('powtodB[out=]', params, r, g)
    assert r is out_ref and g is out_our, 'out= identity contract'


def fuzz_unit_transforms(rng):
    for s, pairs in [
        ('dBm', ('unit_dB_to_linear', 'unit_dB_to_wave')),
        ('dBV', ('unit_dB_to_linear', 'unit_dB_to_wave')),
        ('mW', ('unit_linear_to_dB',)),
        ('V', ('unit_wave_to_dB', 'unit_wave_to_linear')),
    ]:
        for fname in pairs:
            r = getattr(REF.power_analysis, fname)(s)
            g = getattr(OURS_PA, fname)(s)
            if r != g:
                raise AssertionError(f'{fname}({s!r}): {r!r} vs {g!r}')


def fuzz_stft(rng):
    nperseg = int(rng.choice([64, 128, 256]))
    frac = rng.choice([0.0, 0.5])
    noverlap = int(nperseg * frac)
    window = str(rng.choice(['hamming', 'hann', 'blackman']))
    n = nperseg * int(rng.integers(2, 6))
    norm = rng.choice([None, 'power'])
    x = _iq(rng, n)
    params = dict(nperseg=nperseg, noverlap=noverlap, window=window, norm=norm)
    kws = dict(
        fs=1e6, window=window, nperseg=nperseg, noverlap=noverlap,
        norm=None if norm is None else str(norm),
    )
    rf, rt, rX = REF.fourier.stft(x, **kws)
    gf, gt, gX = OURS.fourier.stft(x, **kws)
    _agree('stft[freqs]', params, rf, gf)
    _agree('stft[times]', params, rt, gt)
    _agree('stft', params, rX, gX, rtol=1e-5)


def fuzz_istft(rng):
    nperseg = int(rng.choice([64, 128]))
    noverlap = nperseg // 2
    n = nperseg * int(rng.integers(3, 6))
    x = _iq(rng, n)
    params = dict(nperseg=nperseg, n=n)
    kws = dict(
        fs=1.0, window='hamming', nperseg=nperseg, noverlap=noverlap,
        return_axis_arrays=False,
    )
    rX = REF.fourier.stft(x, **kws)
    r = REF.fourier.istft(rX.copy(), nfft=nperseg, noverlap=noverlap)
    g = OURS.fourier.istft(rX.copy(), nfft=nperseg, noverlap=noverlap)
    _agree('istft', params, r, g, rtol=1e-5)


def fuzz_spectrogram(rng):
    nperseg = int(rng.choice([64, 128, 256]))
    noverlap = int(nperseg * rng.choice([0.0, 0.5]))
    window = str(rng.choice(['hamming', 'hann']))
    n = nperseg * int(rng.integers(2, 6))
    x = _iq(rng, n)
    params = dict(nperseg=nperseg, noverlap=noverlap, window=window)
    kws = dict(fs=1e6, window=window, nperseg=nperseg, noverlap=noverlap)
    rf, rt, rS = REF.fourier.spectrogram(x, **kws)
    gf, gt, gS = OURS.fourier.spectrogram(x, **kws)
    _agree('spectrogram[freqs]', params, rf, gf)
    _agree('spectrogram', params, rS, gS, rtol=1e-5)


def fuzz_psd(rng):
    """our power_spectral_density vs an oracle built on the REFERENCE
    spectrogram.

    The reference entry point itself crashes on every call (reference
    fourier.py:1318 assigns the (nq, nbin) quantile block into a
    swapaxed (nbin, nq) view) — see docs/PARITY.md.
    """
    nperseg = int(rng.choice([64, 128, 256]))
    nblocks = int(rng.integers(4, 10))
    n = nperseg * nblocks
    fs = 1e6
    x = _iq(rng, n)
    stats = [0.25, 'mean', 'max'] if rng.integers(0, 2) else ['min', 0.9, 'rms']
    params = dict(nperseg=nperseg, n=n, stats=stats)
    _, _, S = REF.fourier.spectrogram(
        x, fs=fs, window='hann', nperseg=nperseg, noverlap=0
    )
    SdB = REF.power_analysis.powtodB(S, eps=1e-25).real
    rows = []
    for s in stats:
        if isinstance(s, float):
            rows.append(np.quantile(SdB, s, axis=0))
        else:
            rows.append(
                REF.fourier.stat_ufunc_from_shorthand(s, xp=np)(SdB, axis=0)
            )
    oracle = np.stack(rows).astype('float32')
    got = OURS.fourier.power_spectral_density(
        x, fs=fs, window='hann', resolution=fs / nperseg, statistics=stats
    )
    _agree('power_spectral_density', params, oracle, got, rtol=2e-5)


def fuzz_resample(rng):
    n_in = 2 * int(rng.integers(16, 200))
    n_out = 2 * int(rng.integers(8, 200))
    x = _iq(rng, n_in)
    params = dict(n_in=n_in, n_out=n_out)
    r = REF.fourier.resample(x.copy(), n_out)
    g = OURS.fourier.resample(x.copy(), n_out)
    _agree('resample', params, r, g, rtol=1e-5)
    # scale=None + overwrite_x=False crashes in the reference
    # (fourier.py:1533 multiplies None*shift) -> exercise the two paths
    # that work: explicit scale, and the overwrite_x short path
    shifted_r = REF.fourier.time_fftshift(x.copy(), scale=1.0)
    shifted_g = OURS.fourier.time_fftshift(x.copy(), scale=1.0)
    _agree('time_fftshift[scale]', params, shifted_r, shifted_g, rtol=1e-5)
    _agree(
        'time_fftshift[overwrite]', params,
        REF.fourier.time_fftshift(x.copy(), overwrite_x=True),
        OURS.fourier.time_fftshift(x.copy(), overwrite_x=True), rtol=1e-5,
    )


def fuzz_ola_filter(rng):
    """OLA framing/window/overlap-add machinery vs the reference.

    The reference's in-band zeroing never fires (zero_stft_by_freq
    passes fs where _freq_band_edges expects a sample period, and
    derives fs from the *block* axis — docs/PARITY.md), so a finite
    passband compares our real bandpass against the reference's no-op.
    A super-Nyquist passband zeroes nothing on either side and checks
    the COLA stft->istft chain exactly.
    """
    window, divisor = [
        ('hamming', 2), ('blackman', 3), ('blackmanharris', 5)
    ][int(rng.integers(0, 3))]
    nfft = divisor * int(rng.choice([32, 64]))
    quantum = {2: 1, 3: 2, 5: 4}[divisor]
    n = nfft * (quantum * int(rng.integers(1, 4)) + quantum)
    fs = 1e6
    x = _iq(rng, n)
    params = dict(window=window, nfft=nfft, n=n)
    kws = dict(fs=fs, nfft=nfft, window=window, passband=(-fs, fs))
    r = REF.fourier.ola_filter(x.copy(), **kws)
    g = OURS.fourier.ola_filter(x.copy(), **kws)
    _agree('ola_filter', params, r, g, rtol=2e-5)


def fuzz_upfirdn(rng):
    up = int(rng.integers(1, 5))
    down = int(rng.integers(1, 5))
    hlen = int(rng.integers(1, 25))
    n = int(rng.integers(max(hlen, 8), 200))
    h = rng.standard_normal(hlen).astype('float32')
    x = _iq(rng, n)
    params = dict(up=up, down=down, hlen=hlen, n=n)
    r = REF.fourier.upfirdn(h, x, up=up, down=down)
    g = OURS.fourier.upfirdn(h, x, up=up, down=down)
    _agree('upfirdn', params, r, g, rtol=1e-5)


def fuzz_bin_power(rng):
    nbin = int(rng.integers(2, 17))
    n = nbin * int(rng.integers(2, 33))
    Ts = 1e-6
    detector = str(rng.choice(['mean', 'max', 'rms', 'min', 'peak']))
    x = _iq(rng, n)
    params = dict(nbin=nbin, n=n, detector=detector)
    r = REF.power_analysis.iq_to_bin_power(x, Ts=Ts, Tbin=nbin * Ts, kind=detector)
    g = OURS_PA.iq_to_bin_power(x, Ts=Ts, Tbin=nbin * Ts, kind=detector)
    _agree('iq_to_bin_power', params, r, g, rtol=1e-5)


def fuzz_cyclic_power(rng):
    # the reference crashes on 1-D input (power_analysis.py:459 indexes
    # shape[1] unconditionally) and mis-truncates when shape[1] is not a
    # bin multiple (truncation length computed from the wrong axis) —
    # docs/PARITY.md. Fuzz the configuration where its numbers are
    # correct: 2-D input, whole cycles, channel count a bin multiple.
    Ts = 1e-6
    nbin = int(rng.integers(2, 9))
    bins_per_cycle = int(rng.integers(2, 6))
    cycles = int(rng.integers(2, 8))
    n = nbin * bins_per_cycle * cycles
    nch = bins_per_cycle * int(rng.integers(1, 3))
    x = _iq(rng, (n, nch))
    params = dict(nbin=nbin, bins_per_cycle=bins_per_cycle, cycles=cycles, nch=nch)
    kws = dict(
        Ts=Ts, detector_period=nbin * Ts,
        cyclic_period=nbin * bins_per_cycle * Ts,
    )
    r = REF.power_analysis.iq_to_cyclic_power(x, **kws)
    g = OURS_PA.iq_to_cyclic_power(x, **kws)
    if set(r) != set(g):
        raise AssertionError(f'cyclic detectors {set(r)} vs {set(g)}')
    for det in r:
        if set(r[det]) != set(g[det]):
            raise AssertionError(f'cyclic stats {set(r[det])} vs {set(g[det])}')
        for stat in r[det]:
            _agree(
                f'iq_to_cyclic_power[{det}][{stat}]', params,
                r[det][stat], g[det][stat], rtol=1e-5,
            )


def fuzz_ccdf(rng):
    n = int(rng.integers(16, 1024))
    nedges = int(rng.integers(4, 48))
    x = np.abs(rng.standard_normal(n)).astype('float32') + 1e-6
    edges = np.linspace(0, float(x.max()) * 1.1, nedges).astype('float32')
    params = dict(n=n, nedges=nedges)
    r = REF.power_analysis.sample_ccdf(x.copy(), edges)
    g = OURS_PA.sample_ccdf(x.copy(), edges)
    _agree('sample_ccdf', params, r, g, rtol=0, atol=1e-7)


def fuzz_histogram_last_axis(rng):
    rows = int(rng.integers(1, 9))
    n = int(rng.integers(8, 256))
    nbins = int(rng.integers(2, 40))
    x = rng.standard_normal((rows, n)).astype('float32')
    params = dict(rows=rows, n=n, nbins=nbins)
    r_counts, r_edges = REF.power_analysis.histogram_last_axis(x, nbins)
    g = OURS_PA.histogram_last_axis(x, nbins)
    g_counts, g_edges = g if isinstance(g, tuple) else (g, r_edges)
    _agree('histogram_last_axis[counts]', params, r_counts, g_counts, rtol=0, atol=0)
    _agree('histogram_last_axis[edges]', params, r_edges, g_edges, rtol=1e-6)


def fuzz_framing(rng):
    n = int(rng.integers(8, 300))
    size = int(rng.integers(1, 16))
    m = max(size, (n // size) * size)
    x = _iq(rng, m)
    params = dict(m=m, size=size)
    _agree(
        'to_blocks', params,
        REF.util.to_blocks(x, size), OURS.util.to_blocks(x, size),
        rtol=0, atol=0,
    )
    wlen = int(rng.integers(1, max(2, m // 2)))
    _agree(
        'sliding_window_view', params,
        REF.util.sliding_window_view(x, wlen, axis=0),
        OURS.util.sliding_window_view(x, wlen, axis=0), rtol=0, atol=0,
    )
    lo = int(rng.integers(0, m // 2))
    hi = int(rng.integers(lo + 1, m + 1))
    _agree(
        'axis_slice', params,
        REF.util.axis_slice(x, lo, hi, axis=0),
        OURS.util.axis_slice(x, lo, hi, axis=0), rtol=0, atol=0,
    )
    # 1-D only: multi-dim pad_along_axis broadcasts the pad to every
    # axis in the reference (docs/PARITY.md bug list)
    before, after = int(rng.integers(0, 9)), int(rng.integers(0, 9))
    _agree(
        'pad_along_axis', params,
        REF.util.pad_along_axis(x, [(before, after)], axis=0),
        OURS.util.pad_along_axis(x, [(before, after)], axis=0),
        rtol=0, atol=0,
    )


def fuzz_design_cola(rng):
    fs_base = float(rng.choice([122.88e6, 61.44e6, 30.72e6]))
    fs_target = float(rng.choice([10e6, 15.36e6, 20e6, 7.68e6]))
    bw = float(rng.choice([fs_target * 0.8, fs_target * 0.5]))
    window = str(rng.choice(['hamming', 'blackman']))
    params = dict(fs_base=fs_base, fs_target=fs_target, bw=bw, window=window)
    kws = dict(fs_base=fs_base, fs_target=fs_target, bw=bw, window=window)
    r = REF.fourier.design_cola_resampler(**kws)
    g = OURS.fourier.design_cola_resampler(**kws)
    for key in r:
        rv, gv = r[key], g.get(key, '<missing>')
        if isinstance(rv, float):
            ok = isinstance(gv, (float, int)) and abs(rv - gv) <= 1e-9 * max(
                abs(rv), 1.0
            )
        else:
            ok = rv == gv
        if not ok:
            raise AssertionError(f'design_cola_resampler[{key}] {params}: {rv!r} vs {gv!r}')


def fuzz_enbw(rng):
    windows = ['hamming', 'hann', 'blackman', ('kaiser', 7.0)]
    window = windows[int(rng.integers(0, len(windows)))]
    n = int(rng.choice([128, 256, 1024]))
    params = dict(window=window, n=n)
    _agree(
        'equivalent_noise_bandwidth', params,
        REF.fourier.equivalent_noise_bandwidth(window, n),
        OURS.fourier.equivalent_noise_bandwidth(window, n), rtol=1e-6,
    )


def fuzz_fftfreq(rng):
    n = int(rng.integers(2, 512))
    d = float(rng.uniform(1e-7, 1.0))
    params = dict(n=n, d=d)
    _agree('fftfreq', params, REF.fourier.fftfreq(n, d), OURS.fourier.fftfreq(n, d), rtol=1e-6)


def fuzz_pss_sss(rng):
    scs = float(rng.choice([15e3, 30e3]))
    sample_rate = float(rng.choice([15.36e6, 30.72e6]))
    shared = bool(rng.integers(0, 2))
    params = dict(scs=scs, sample_rate=sample_rate, shared=shared)
    rp = REF_OFDM.pss_params(
        sample_rate=sample_rate, subcarrier_spacing=scs, shared_spectrum=shared
    )
    gp = OURS_OFDM.pss_params(
        sample_rate=sample_rate, subcarrier_spacing=scs, shared_spectrum=shared
    )
    rd = rp._asdict()
    gd = gp._asdict() if hasattr(gp, '_asdict') else dict(gp)
    for key, rv in rd.items():
        gv = gd.get(key, '<missing>')
        same = (
            np.allclose(rv, gv)
            if isinstance(rv, (int, float, np.ndarray))
            else rv == gv
        )
        if not same:
            raise AssertionError(f'pss_params[{key}] {params}: {rv!r} vs {gv!r}')
    r = REF_OFDM.pss_5g_nr(sample_rate, scs)
    g = OURS_OFDM.pss_5g_nr(sample_rate, scs)
    _agree('pss_5g_nr', params, r, g, rtol=1e-5)
    r = REF_OFDM.sss_5g_nr(sample_rate, scs)
    g = OURS_OFDM.sss_5g_nr(sample_rate, scs)
    _agree('sss_5g_nr', params, r, g, rtol=1e-5)


def fuzz_corr_at_indices(rng):
    # reference corr_at_indices runs the numba source as pure python
    # under the stub (slow) -> keep N small
    nfft = int(rng.choice([32, 64]))
    n = nfft * int(rng.integers(3, 6))
    n_inds = int(rng.integers(2, 6))
    inds = np.sort(rng.choice(n - 2 * nfft, size=n_inds, replace=False)).astype(
        'int64'
    )
    x = _iq(rng, n)
    norm = bool(rng.integers(0, 2))
    params = dict(nfft=nfft, n=n, inds=inds.tolist(), norm=norm)
    r = REF_OFDM.corr_at_indices(inds, x, nfft, norm=norm)
    g = OURS_OFDM.corr_at_indices(inds, x, nfft, norm=norm)
    _agree('corr_at_indices', params, r, g, rtol=2e-5)


def fuzz_phy(rng):
    scs = float(rng.choice([15e3, 30e3]))
    bw = float(rng.choice([10e6, 15e6, 20e6]))
    params = dict(scs=scs, bw=bw)
    r = REF_OFDM.Phy3GPP(channel_bandwidth=bw, subcarrier_spacing=scs)
    g = OURS_OFDM.Phy3GPP(channel_bandwidth=bw, subcarrier_spacing=scs)
    for attr in (
        'nfft', 'sample_rate', 'frame_duration', 'frame_size',
        'contiguous_size', 'subcarriers',
    ):
        missing = object()
        rv = getattr(r, attr, missing)
        if rv is missing:  # not defined for this config in the reference
            continue
        gv = getattr(g, attr, '<missing>')
        if not np.all(np.asarray(rv) == np.asarray(gv)):
            raise AssertionError(f'Phy3GPP.{attr} {params}: {rv!r} vs {gv!r}')
    for attr in ('cp_sizes', 'cp_start_idx', 'symbol_idx', 'cp_idx'):
        rv = getattr(r, attr, None)
        gv = getattr(g, attr, None)
        if rv is not None:
            _agree(
                f'Phy3GPP.{attr}', params,
                np.asarray(rv), np.asarray(gv), rtol=0, atol=0,
            )


def fuzz_extra_windows(rng):
    M = int(rng.integers(8, 257))
    sym = bool(rng.integers(0, 2))
    alpha = float(rng.uniform(1.5, 8.0))
    sigma_t = float(rng.uniform(0.1, 0.5))
    params = dict(M=M, sym=sym, alpha=alpha, sigma_t=sigma_t)
    for name, kws in [
        ('knab', dict(alpha=alpha, sym=sym)),
        ('cosh', dict(alpha=alpha, sym=sym)),
        ('modified_bessel', dict(alpha=alpha, sym=sym)),
        ('acg', dict(sigma_t=sigma_t, sym=sym)),
    ]:
        r = getattr(REF_WINDOWS, name)(M, **kws)
        g = getattr(OURS_WINDOWS, name)(M, **kws)
        _agree(f'windows.{name}', params, r, g, rtol=1e-6)


def fuzz_ofdm_helpers(rng):
    n = int(rng.integers(16, 256))
    x = _iq(rng, n)
    shift = float(rng.uniform(-0.5, 0.5))
    params = dict(n=n, shift=shift)
    _agree(
        'subsample_shift', params,
        REF_OFDM.subsample_shift(x.copy(), shift),
        OURS_OFDM.subsample_shift(x.copy(), shift), rtol=1e-5,
    )
    ncols = int(rng.integers(1, 6))
    a = _iq(rng, (n, ncols))
    b = _iq(rng, (n, ncols))
    _agree(
        'correlate_along_axis', params,
        REF_OFDM.correlate_along_axis(a, b, axis=0),
        OURS_OFDM.correlate_along_axis(a, b, axis=0), rtol=1e-5,
    )
    ix = rng.integers(0, 100, size=int(rng.integers(1, 8)))
    iy = rng.integers(0, 100, size=int(rng.integers(1, 8)))
    _agree(
        'indexsum2d', params,
        REF_OFDM.indexsum2d(ix, iy), OURS_OFDM.indexsum2d(ix, iy),
        rtol=0, atol=0,
    )


def fuzz_oaconvolve(rng):
    hlen = int(rng.integers(2, 65))
    n = int(rng.integers(max(hlen, 16), 1024))
    mode = ['full', 'same', 'valid'][int(rng.integers(0, 3))]
    cplx = bool(rng.integers(0, 2))
    h = rng.standard_normal(hlen).astype('float32')
    x = _iq(rng, n) if cplx else rng.standard_normal(n).astype('float32')
    params = dict(hlen=hlen, n=n, mode=mode, cplx=cplx)
    r = REF.fourier.oaconvolve(x, h, mode=mode)
    g = OURS.fourier.oaconvolve(x, h, mode=mode)
    _agree('oaconvolve', params, r, g, rtol=1e-5)


def fuzz_oaresample(rng):
    up, down = [(1, 2), (2, 3), (3, 4), (2, 1), (5, 4)][int(rng.integers(0, 5))]
    nch = int(rng.integers(1, 4))
    n = 256 * int(rng.integers(4, 17))
    fs = 1e6
    x = _iq(rng, (nch, n))
    params = dict(up=up, down=down, nch=nch, n=n)
    kws = dict(up=up, down=down, fs=fs, axis=1)
    try:
        r = REF.fourier.oaresample(x.copy(), **kws)
    except ValueError:
        # design-time rejection (COLA nfft parity); ours must reject too
        try:
            OURS.fourier.oaresample(x.copy(), **kws)
        except ValueError:
            return
        raise AssertionError(f'oaresample {params}: reference raises, ours does not')
    g = OURS.fourier.oaresample(x.copy(), **kws)
    _agree('oaresample', params, r, g, rtol=2e-5)


def fuzz_iq_to_stft_spectrogram(rng):
    nfft = int(rng.choice([128, 256]))
    n = nfft * int(rng.integers(3, 8))
    Ts = float(rng.choice([1e-6, 0.5e-6]))
    overlap = bool(rng.integers(0, 2))
    x = _iq(rng, n)
    params = dict(nfft=nfft, n=n, Ts=Ts, overlap=overlap)
    r = REF.fourier.iq_to_stft_spectrogram(x, 'hamming', nfft, Ts, overlap=overlap)
    g = OURS.fourier.iq_to_stft_spectrogram(x, 'hamming', nfft, Ts, overlap=overlap)
    _agree('iq_to_stft_spectrogram', params, np.asarray(r), np.asarray(g), rtol=1e-5)
    _agree('iq_to_stft_spectrogram[index]', params, r.index.values, g.index.values, rtol=1e-9)
    _agree('iq_to_stft_spectrogram[columns]', params, r.columns.values, g.columns.values, rtol=1e-9)


def fuzz_downsample_stft(rng):
    nperseg = int(rng.choice([128, 256]))
    n = nperseg * int(rng.integers(3, 8))
    fs = 1e6
    nfft_out = nperseg // int(rng.choice([2, 4]))
    bw = float(rng.uniform(0.2, 0.8)) * fs * nfft_out / nperseg
    x = _iq(rng, n)
    params = dict(nperseg=nperseg, n=n, nfft_out=nfft_out, bw=bw)
    f, _, Y = REF.fourier.stft(
        x, fs=fs, window='hamming', nperseg=nperseg, noverlap=0
    )
    rf, rY = REF.fourier.downsample_stft(
        f.copy(), Y.copy(), nfft_out=nfft_out, passband=(-bw / 2, bw / 2)
    )
    gf, gY = OURS.fourier.downsample_stft(
        f.copy(), Y.copy(), nfft_out=nfft_out, passband=(-bw / 2, bw / 2)
    )
    _agree('downsample_stft[freqs]', params, rf, gf, rtol=1e-9)
    _agree('downsample_stft', params, rY, gY, rtol=1e-6)


def fuzz_stft_fir_lowpass(rng):
    nperseg = int(rng.choice([128, 256]))
    n = nperseg * int(rng.integers(3, 8))
    fs = 1e6
    bw = float(rng.uniform(0.2, 0.6)) * fs
    tbw = float(rng.uniform(0.02, 0.1)) * fs
    x = _iq(rng, n)
    params = dict(nperseg=nperseg, n=n, bw=bw, tbw=tbw)
    _, _, Y = REF.fourier.stft(
        x, fs=fs, window='hamming', nperseg=nperseg, noverlap=0
    )
    r = REF.fourier.stft_fir_lowpass(
        Y.copy(), sample_rate=fs, bandwidth=bw, transition_bandwidth=tbw
    )
    g = OURS.fourier.stft_fir_lowpass(
        Y.copy(), sample_rate=fs, bandwidth=bw, transition_bandwidth=tbw
    )
    _agree('stft_fir_lowpass', params, r, g, rtol=1e-5)


def fuzz_waveform_to_frame(rng):
    import pandas as pd  # noqa: F401

    n = int(rng.integers(16, 512))
    ncol = int(rng.integers(1, 4))
    Ts = float(rng.choice([1e-6, 0.5e-6]))
    oned = bool(rng.integers(0, 2))
    x = _iq(rng, n if oned else (n, ncol))
    params = dict(n=n, ncol=ncol, Ts=Ts, oned=oned)
    r = REF.io.waveform_to_frame(x, Ts=Ts)
    g = OURS.io.waveform_to_frame(x, Ts=Ts)
    _agree('waveform_to_frame', params, np.asarray(r), np.asarray(g), rtol=0, atol=0)
    _agree('waveform_to_frame[index]', params, r.index.values, g.index.values, rtol=1e-9)
    if r.index.name != g.index.name:
        raise AssertionError(
            f'waveform_to_frame index name {r.index.name!r} vs {g.index.name!r}'
        )


def fuzz_binned_mean(rng):
    ndim = int(rng.integers(1, 3))
    axis = int(rng.integers(0, ndim))
    shape = [int(rng.integers(1, 4)) for _ in range(ndim)]
    count = int(rng.integers(2, 17))
    shape[axis] = count * int(rng.integers(2, 17))
    x = rng.standard_normal(shape).astype('float32')
    kws = dict(
        axis=axis,
        reject_extrema=bool(rng.integers(0, 2)),
        fft=bool(rng.integers(0, 2)),
    )
    params = dict(shape=shape, count=count, **kws)
    r = REF.util.binned_mean(x, count, **kws)
    g = OURS.util.binned_mean(x, count, **kws)
    _agree('binned_mean', params, r, g, rtol=1e-5)


def fuzz_dblin(rng):
    ndim = int(rng.integers(1, 3))
    shape = [int(rng.integers(2, 33)) for _ in range(ndim)]
    axis_choices = [None] + list(range(ndim))
    axis = axis_choices[int(rng.integers(0, len(axis_choices)))]
    x_dB = (10 * np.log10(rng.gamma(2.0, size=shape) + 1e-9)).astype('float32')
    params = dict(shape=shape, axis=axis)
    for fname in ('dBlinmean', 'dBlinsum'):
        r = getattr(REF.power_analysis, fname)(x_dB.copy(), axis=axis)
        g = getattr(OURS_PA, fname)(x_dB.copy(), axis=axis)
        _agree(fname, params, r, g, rtol=1e-5)


def fuzz_window_solver(rng):
    window, lo, hi = [
        ('kaiser', 1.2, 3.0), ('dpss', 1.2, 3.0), ('chebwin', 1.2, 2.2)
    ][int(rng.integers(0, 3))]
    enbw = float(rng.uniform(lo, hi))
    nfft = int(rng.choice([512, 1024]))
    params = dict(window=window, enbw=enbw, nfft=nfft)
    try:
        r = REF.fourier.find_window_param_from_enbw(window, enbw, nfft=nfft)
    except ValueError:
        # target outside the solver bracket: ours must reject too
        try:
            OURS.fourier.find_window_param_from_enbw(window, enbw, nfft=nfft)
        except ValueError:
            return
        raise AssertionError(
            f'find_window_param_from_enbw {params}: reference raises, ours does not'
        )
    g = OURS.fourier.find_window_param_from_enbw(window, enbw, nfft=nfft)
    _agree('find_window_param_from_enbw', params, r, g, rtol=1e-5)


def fuzz_power_histogram_along_axis(rng):
    """our power_histogram_along_axis vs an oracle over the reference's
    working histogram_last_axis.

    The reference entry point itself crashes on every call (its
    `.astype` on the (counts, edges) tuple, power_analysis.py:639 —
    docs/PARITY.md), so the oracle rebuilds the intended reshape +
    per-row histogram with the reference's own working internals.
    """
    import pandas as pd

    res_axis = int(rng.integers(1, 5))
    rows = int(rng.integers(2, 17))
    nfreq = res_axis * int(rng.integers(2, 9)) + int(rng.integers(0, res_axis))
    lo, hi = -30.0, 10.0
    res_db = float(rng.choice([1.0, 2.0, 4.0]))
    # linear power input; the entry point applies powtodB itself
    x = rng.gamma(2.0, size=(rows, nfreq)).astype('float32') + 1e-9
    pvt = pd.DataFrame(
        x, index=np.arange(rows) * 1e-3, columns=np.linspace(-4, 4, nfreq)
    )
    params = dict(rows=rows, nfreq=nfreq, res_axis=res_axis, res_db=res_db)
    g = OURS_PA.power_histogram_along_axis(
        pvt, bounds=(lo, hi), resolution_db=res_db, resolution_axis=res_axis
    )
    # oracle: the reference flow with its two crashes repaired (axis=0
    # transposes, powtodB, truncate, reshape, n_bins = 1 + range/res)
    xT = 10 * np.log10(x.T)
    n_groups = xT.shape[0] // res_axis
    kept = xT[: n_groups * res_axis]
    reshaped = kept.reshape(n_groups, res_axis * kept.shape[1])
    n_bins = 1 + int((hi - lo) / res_db)
    counts, _ = REF.power_analysis.histogram_last_axis(
        reshaped.astype('float32'), n_bins, (lo, hi)
    )
    _agree(
        'power_histogram_along_axis', params,
        counts.astype('uint32'), np.asarray(g), rtol=0, atol=0,
    )
    edges = np.linspace(lo, hi, n_bins + 1)
    _agree(
        'power_histogram_along_axis[columns]', params,
        (edges[:-1] + edges[1:]) / 2, g.columns.values, rtol=1e-9,
    )

    # Series input: documented by the reference but crashed there
    # (pvt.shape[1] IndexError on 1-D input — docs/PARITY.md); treated
    # as a single column here
    n = res_axis * int(rng.integers(2, 9)) + int(rng.integers(0, res_axis))
    s = pd.Series(
        rng.gamma(2.0, size=n).astype('float32') + 1e-9,
        index=np.arange(n) * 1e-3,
    )
    gs = OURS_PA.power_histogram_along_axis(
        s, bounds=(lo, hi), resolution_db=res_db, resolution_axis=res_axis
    )
    n_groups = n // res_axis
    reshaped = 10 * np.log10(s.values[: n_groups * res_axis]).reshape(
        n_groups, res_axis
    )
    counts, _ = REF.power_analysis.histogram_last_axis(
        reshaped.astype('float32'), n_bins, (lo, hi)
    )
    _agree(
        'power_histogram_along_axis[series]', params,
        counts.astype('uint32'), np.asarray(gs), rtol=0, atol=0,
    )


def fuzz_domain_binned_cyclic(rng):
    """pre-binned-power cyclic statistics vs the TIME-domain result.

    The reference's TIME_BINNED_POWER branch crashes (it reads `.ndim`
    on the input dict, power_analysis.py:475 — docs/PARITY.md), so the
    oracle is the reference's working TIME-domain path on the same raw
    iq: mathematically the pre-binned call must reproduce it.
    """
    Ts = 1e-6
    nbin = int(rng.integers(2, 9))
    bins_per_cycle = int(rng.integers(2, 6))
    cycles = int(rng.integers(2, 8))
    n = nbin * bins_per_cycle * cycles
    nch = bins_per_cycle * int(rng.integers(1, 3))
    x = _iq(rng, (n, nch))
    params = dict(nbin=nbin, bins_per_cycle=bins_per_cycle, cycles=cycles, nch=nch)
    kws = dict(
        Ts=Ts, detector_period=nbin * Ts,
        cyclic_period=nbin * bins_per_cycle * Ts,
    )
    oracle = REF.power_analysis.iq_to_cyclic_power(x, **kws)
    binned = {
        d: OURS_PA.iq_to_bin_power(x, Ts=Ts, Tbin=nbin * Ts, kind=d)
        for d in ('rms', 'peak')
    }
    with OURS.util.set_input_domain('time_binned_power'):
        got = OURS_PA.iq_to_cyclic_power(binned, **kws)
    for det in oracle:
        for stat in oracle[det]:
            _agree(
                f'cyclic_binned[{det}][{stat}]', params,
                oracle[det][stat], got[det][stat], rtol=1e-5,
            )


def fuzz_phy802_16(rng):
    bw = float(rng.choice([5e6, 7e6, 10e6, 20e6]))
    params = dict(bw=bw)
    try:
        r = REF_OFDM.Phy802_16(channel_bandwidth=bw)
    except (ValueError, KeyError):
        try:
            OURS_OFDM.Phy802_16(channel_bandwidth=bw)
        except (ValueError, KeyError):
            return
        raise AssertionError(f'Phy802_16 {params}: reference rejects, ours does not')
    g = OURS_OFDM.Phy802_16(channel_bandwidth=bw)
    for attr in (
        'nfft', 'sample_rate', 'frame_duration', 'frame_size',
        'contiguous_size', 'sampling_factor', 'cp_ratio',
        'symbols_per_frame',
    ):
        missing = object()
        rv = getattr(r, attr, missing)
        if rv is missing:
            continue
        gv = getattr(g, attr, '<missing>')
        if not np.all(np.asarray(rv) == np.asarray(gv)):
            raise AssertionError(f'Phy802_16.{attr} {params}: {rv!r} vs {gv!r}')
    for attr in ('cp_sizes', 'cp_start_idx', 'symbol_idx', 'cp_idx'):
        rv = getattr(r, attr, None)
        if rv is not None:
            _agree(
                f'Phy802_16.{attr}', params,
                np.asarray(rv), np.asarray(getattr(g, attr)), rtol=0, atol=0,
            )


def fuzz_util_helpers(rng):
    n = int(rng.integers(3, 200))
    d = int(rng.integers(1, 20))
    params = dict(n=n, d=d)
    if REF.util.ceildiv(n, d) != OURS.util.ceildiv(n, d):
        raise AssertionError(f'ceildiv {params}')
    val = float(rng.uniform(0, 50))
    div = float(rng.choice([0.5, 1.0, 2.5, 3.0]))
    r = REF.util.isroundmod(val, div)
    g = OURS.util.isroundmod(val, div)
    if bool(r) != bool(g):
        raise AssertionError(f'isroundmod({val}, {div}): {r} vs {g}')
    for v in (val, round(val / div) * div):
        r = REF_OFDM.isclosetoint(v)
        g = OURS_OFDM.isclosetoint(v)
        if bool(np.all(r == g)) is False:
            raise AssertionError(f'isclosetoint({v}): {r} vs {g}')
    for dt in ('float32', 'float64', 'complex64', 'complex128'):
        x = np.zeros(2, dt)
        if REF.util.float_dtype_like(x) != OURS.util.float_dtype_like(x):
            raise AssertionError(f'float_dtype_like({dt})')
    # broadcast_onto / axis_index
    ndim = int(rng.integers(2, 4))
    shape = [int(rng.integers(2, 5)) for _ in range(ndim)]
    axis = int(rng.integers(0, ndim))
    big = rng.standard_normal(shape).astype('float32')
    vec = rng.standard_normal(shape[axis]).astype('float32')
    _agree(
        'broadcast_onto', params,
        np.broadcast_to(REF.fourier.broadcast_onto(vec, big, axis=axis), shape),
        np.broadcast_to(OURS.fourier.broadcast_onto(vec, big, axis=axis), shape),
        rtol=0, atol=0,
    )
    mask = rng.integers(0, 2, size=shape[axis]).astype(bool)
    _agree(
        'axis_index', params,
        REF.util.axis_index(big, mask, axis=axis),
        OURS.util.axis_index(big, mask, axis=axis), rtol=0, atol=0,
    )
    # grouped views: identical ordered partition (axis 0 stays whole;
    # the other axes are split to bound view size)
    x2 = rng.standard_normal((int(rng.integers(2, 9)), 24)).astype('float32')
    max_size = int(rng.choice([48, 64, 96]))
    rparts = [np.asarray(v) for v in REF.util.grouped_views_along_axis(x2, max_size)]
    gparts = [np.asarray(v) for v in OURS.util.grouped_views_along_axis(x2, max_size)]
    if len(rparts) != len(gparts):
        raise AssertionError(
            f'grouped_views_along_axis {params}: {len(rparts)} vs {len(gparts)} views'
        )
    for i, (rp, gp) in enumerate(zip(rparts, gparts)):
        _agree(f'grouped_views_along_axis[{i}]', params, rp, gp, rtol=0, atol=0)


def fuzz_fft_wrappers(rng):
    ndim = int(rng.integers(1, 3))
    axis = int(rng.integers(0, ndim))
    shape = [int(rng.integers(1, 4)) for _ in range(ndim)]
    shape[axis] = int(rng.choice([64, 128, 257]))
    x = _iq(rng, shape)
    params = dict(shape=shape, axis=axis)
    _agree('fft', params, REF.fourier.fft(x.copy(), axis=axis),
           OURS.fourier.fft(x.copy(), axis=axis), rtol=1e-5)
    _agree('ifft', params, REF.fourier.ifft(x.copy(), axis=axis),
           OURS.fourier.ifft(x.copy(), axis=axis), rtol=1e-5)
    if ndim == 1:
        Ts = float(rng.choice([1e-6, 2e-6]))
        r = REF.fourier.time_to_frequency(x.copy(), Ts)
        g = OURS.fourier.time_to_frequency(x.copy(), Ts)
        r = r[-1] if isinstance(r, tuple) else r
        g = g[-1] if isinstance(g, tuple) else g
        _agree('time_to_frequency', params, r, g, rtol=1e-5)


def fuzz_call_by_block(rng):
    size = int(rng.integers(2, 17))
    n = size * int(rng.integers(2, 17))
    x = _iq(rng, n)
    params = dict(size=size, n=n)
    fn = lambda v: v * 2.0  # noqa: E731
    _agree(
        'call_by_block', params,
        REF_OFDM.call_by_block(fn, x.copy(), size),
        OURS_OFDM.call_by_block(fn, x.copy(), size), rtol=0, atol=0,
    )


def _make_cp_waveform(phy, n_slots, rng):
    """synthesize a waveform with the CP structure of ``phy``
    (mirrors tests/test_ofdm.py make_cp_waveform)."""
    cps = np.asarray(phy.cp_sizes)
    wave = []
    for _ in range(n_slots):
        for i in range(len(cps)):
            s = (
                rng.standard_normal(phy.nfft)
                + 1j * rng.standard_normal(phy.nfft)
            ) / np.sqrt(2)
            wave += [s[-cps[i]:], s]
    return np.concatenate(wave).astype('complex64')


def fuzz_symbol_decoder(rng):
    bw = float(rng.choice([1.4e6, 5e6, 10e6]))
    rdec = REF_OFDM.SymbolDecoder(channel_bandwidth=bw)
    gdec = OURS_OFDM.SymbolDecoder(channel_bandwidth=bw)
    phy = rdec.phy
    nblk = int(rng.integers(3, 7))
    n = nblk * 2 * phy.contiguous_size
    x = _iq(rng, n)
    # a strong power step makes the TTI-alignment argmax unambiguous
    step = int(rng.integers(n // 4, 3 * n // 4))
    x[step:] *= 4.0
    params = dict(bw=bw, nblk=nblk, step=step)
    r = rdec(x.copy())
    g = gdec(x.copy())
    _agree('SymbolDecoder', params, r, np.asarray(g), rtol=1e-5)


def fuzz_clock_sync_estimate(rng):
    """clock-mismatch estimation parity on identical input.

    Output waveforms are not compared: both loops converge but may
    apply the total correction through different per-pass resample
    sequences (equally valid synchronized outputs that differ
    sample-wise). The measured offsets per sync window and the
    regression estimate ARE deterministic on the same input.
    """
    sub = int(rng.choice([4, 8]))
    rs = REF_OFDM.BasebandClockSynchronizer(1.4e6, correlation_subframes=sub)
    gs = OURS_OFDM.BasebandClockSynchronizer(1.4e6, correlation_subframes=sub)
    phy = rs.phy
    n_slots = int(rng.integers(40, 100))
    slip = int(rng.integers(4, 25))
    x = _make_cp_waveform(phy, n_slots, rng)
    y = np.asarray(OURS.fourier.resample(x, x.size - slip))
    params = dict(sub=sub, n_slots=n_slots, slip=slip)
    import contextlib
    import io as _io

    with contextlib.redirect_stdout(_io.StringIO()):
        # the reference prints progress lines from inside the estimator
        r_off = np.asarray(rs._offset_by_sync_period(y.copy()))
        r_slip, r_icpt = rs._estimate_clock_mismatch(y.copy())
    g_off = np.asarray(gs._offset_by_sync_period(y.copy()))
    _agree('clock_sync[offsets]', params, r_off, g_off, rtol=1e-4)
    g_slip, g_icpt = gs._estimate_clock_mismatch(y.copy())
    if int(r_slip) != int(g_slip):
        raise AssertionError(
            f'clock_sync[slip] {params}: {int(r_slip)} vs {int(g_slip)}'
        )
    _agree('clock_sync[intercept]', params, r_icpt, g_icpt, rtol=1e-3)


def fuzz_design_fir_lpf(rng):
    fs = float(rng.choice([10e6, 61.44e6, 122.88e6]))
    bw = float(rng.uniform(0.1, 0.7)) * fs
    numtaps = int(rng.choice([101, 501, 1001]))
    tbw = float(rng.uniform(0.01, 0.05)) * fs
    params = dict(fs=fs, bw=bw, numtaps=numtaps, tbw=tbw)
    r = REF.fourier.design_fir_lpf(
        bw, fs, numtaps=numtaps, transition_bandwidth=tbw
    )
    g = OURS.fourier.design_fir_lpf(
        bw, fs, numtaps=numtaps, transition_bandwidth=tbw
    )
    _agree('design_fir_lpf', params, np.asarray(r), np.asarray(g), rtol=1e-6)


def fuzz_unstack_series_to_bins(rng):
    """ours vs the reference's intended reshape contract.

    The reference entry point crashes on any pandas 2.x
    (TimedeltaIndex(unit=) removed — docs/PARITY.md), so the oracle is
    the documented behavior: values reshaped to (bins, samples/bin)
    with a timedelta row index and an elapsed-seconds column index.
    """
    import pandas as pd

    nbin = int(rng.integers(2, 17))
    n = nbin * int(rng.integers(2, 33))
    Ts = float(rng.choice([1e-6, 5e-6]))
    vals = rng.standard_normal(n).astype('float32')
    ser = pd.Series(vals, index=np.arange(n) * Ts)
    params = dict(nbin=nbin, n=n, Ts=Ts)
    out = OURS_PA.unstack_series_to_bins(ser, Tbin=nbin * Ts, truncate=True)
    _agree(
        'unstack_series_to_bins', params,
        vals.reshape(n // nbin, nbin), np.asarray(out), rtol=0, atol=0,
    )
    if not isinstance(out.index, pd.TimedeltaIndex):
        raise AssertionError(
            f'unstack_series_to_bins index is {type(out.index).__name__}, '
            'expected TimedeltaIndex (reference power_analysis.py:547 intent)'
        )
    _agree(
        'unstack_series_to_bins[columns]', params,
        np.arange(nbin) * Ts, out.columns.values.astype(float), rtol=1e-9,
    )


def fuzz_read_sigmf(rng):
    """file-level SigMF read parity on synthesized capture sets.

    Capture starts are kept sorted (the reference silently corrupts
    out-of-order metadata — docs/PARITY.md) and read_sigmf_to_df is
    checked on our side only (the reference's crashes on every call:
    3-tuple unpack of a 4-tuple return, io.py:102).
    """
    import json
    import os
    import tempfile

    n_caps = int(rng.integers(1, 5))
    seg = int(rng.integers(100, 2000))
    n = seg * n_caps
    fs = float(rng.choice([1e6, 10e6, 122.88e6]))
    gain_dB = float(rng.choice([0.0, 10.0, 23.0]))
    with_cal = bool(rng.integers(0, 2))
    x = _iq(rng, n)
    params = dict(n_caps=n_caps, seg=seg, fs=fs, with_cal=with_cal, gain_dB=gain_dB)

    meta = {
        'global': {'core:sample_rate': fs},
        'captures': [
            {
                'core:sample_start': i * seg,
                'core:frequency': 1e9 + i * 1e8,
                'core:datetime': f't{i}',
            }
            for i in range(n_caps)
        ],
        'annotations': (
            [
                {
                    'ntia-core:annotation_type': 'CalibrationAnnotation',
                    'ntia-sensor:temperature': 21.5,
                    'ntia-sensor:noise_figure_sensor': 7.0,
                    'ntia-sensor:gain_preselector': gain_dB,
                }
            ]
            if with_cal
            else []
        ),
    }
    with tempfile.TemporaryDirectory() as d:
        mp = os.path.join(d, 'cap.sigmf-meta')
        with open(mp, 'w') as fd:
            json.dump(meta, fd)
        np.save(os.path.join(d, 'cap.sigmf-data.npy'), x)

        import contextlib
        import io as _io

        with contextlib.redirect_stdout(_io.StringIO()):
            r_split, r_freqs, r_Ts, r_cal = REF.io.read_sigmf(
                mp, ntia_extensions=with_cal
            )
        g_split, g_freqs, g_Ts, g_cal = OURS.io.read_sigmf(
            mp, ntia_extensions=with_cal
        )
        if len(r_split) != len(g_split):
            raise AssertionError(
                f'read_sigmf {params}: {len(r_split)} vs {len(g_split)} segments'
            )
        for i, (rs, gs) in enumerate(zip(r_split, g_split)):
            _agree(f'read_sigmf[seg {i}]', params, rs, gs, rtol=1e-7)
        _agree('read_sigmf[freqs]', params, r_freqs, np.asarray(g_freqs), rtol=0, atol=0)
        if r_Ts != g_Ts:
            raise AssertionError(f'read_sigmf[Ts] {params}: {r_Ts} vs {g_Ts}')
        for key, rv in r_cal.items():
            gv = g_cal.get(key, '<missing>')
            if not (rv == gv or (rv is None and gv is None)):
                raise AssertionError(f'read_sigmf[cal {key}] {params}: {rv} vs {gv}')
        if not with_cal:
            # read_sigmf_to_df has no ntia flag (reference signature);
            # compare only the un-calibrated payload path
            df = OURS.io.read_sigmf_to_df(mp)
            _agree(
                'read_sigmf_to_df[values]', params,
                np.stack([np.asarray(s) for s in r_split]).T, np.asarray(df),
                rtol=1e-7,
            )


def fuzz_sss_params(rng):
    """sss_params parity (reference ofdm.py:421-448: pss_params with
    symbol indexes incremented by 2)."""
    scs = float(rng.choice([15e3, 30e3]))
    sample_rate = float(rng.choice([15.36e6, 30.72e6]))
    shared = bool(rng.integers(0, 2))
    params = dict(scs=scs, sample_rate=sample_rate, shared=shared)
    rp = REF_OFDM.sss_params(
        sample_rate=sample_rate, subcarrier_spacing=scs, shared_spectrum=shared
    )
    gp = OURS_OFDM.sss_params(
        sample_rate=sample_rate, subcarrier_spacing=scs, shared_spectrum=shared
    )
    rd = rp._asdict()
    gd = gp._asdict() if hasattr(gp, '_asdict') else dict(gp)
    for key, rv in rd.items():
        gv = gd.get(key, '<missing>')
        same = (
            np.allclose(rv, gv)
            if isinstance(rv, (int, float, np.ndarray))
            else rv == gv
        )
        if not same:
            raise AssertionError(f'sss_params[{key}] {params}: {rv!r} vs {gv!r}')


def fuzz_design_fir_resampler(rng):
    """design_fir_resampler vs the reference's intended contract.

    The reference entry point crashes as released (fourier.py:542 does
    `design.fs` attribute access on a TypedDict — docs/PARITY.md), so
    the oracle is its own working internals: design_cola_resampler with
    min_fft_size=1, avoid_primes=False, taking fs / (nfft_out, nfft) as
    the (rate, upfirdn up/down) pair.
    """
    fs_base = float(rng.choice([122.88e6, 61.44e6, 30.72e6]))
    fs_target = float(rng.choice([10e6, 15.36e6, 20e6, 7.68e6]))
    bw = float(rng.choice([fs_target * 0.8, fs_target * 0.5]))
    params = dict(fs_base=fs_base, fs_target=fs_target, bw=bw)
    ref_design = REF.fourier.design_cola_resampler(
        fs_base, fs_target, bw=bw, min_fft_size=1, avoid_primes=False
    )
    g_fs, g_fir = OURS.fourier.design_fir_resampler(fs_base, fs_target, bw=bw)
    if g_fs != ref_design['fs']:
        raise AssertionError(
            f'design_fir_resampler[fs] {params}: {ref_design["fs"]} vs {g_fs}'
        )
    want_fir = {'up': ref_design['nfft_out'], 'down': ref_design['nfft']}
    if dict(g_fir) != want_fir:
        raise AssertionError(
            f'design_fir_resampler[fir] {params}: {want_fir} vs {dict(g_fir)}'
        )


def fuzz_util_misc(rng):
    """find_float_inds / dtype_change_float / sliding_window_output_shape
    / iter_along_axes / grouped_slices_along_axis parity
    (reference util.py:121-133, :545-568, :227-268, :571-589, :597-620).
    """
    # find_float_inds on a mixed str/number sequence
    pool = ['a', '1.5', 'nan', 'inf', '1e3', 'x2', '', '-7']
    seq = tuple(rng.choice(pool, size=int(rng.integers(1, 8)))) + (
        float(rng.uniform(-5, 5)),
    )
    r = REF.util.find_float_inds(seq)
    g = OURS.util.find_float_inds(seq)
    if list(r) != list(g):
        raise AssertionError(f'find_float_inds({seq}): {r} vs {g}')

    # dtype_change_float over the full dtype matrix incl. error cases
    for dt in ('float16', 'float32', 'float64', 'complex64', 'complex128', 'int16'):
        for basis in ('float32', 'float64'):
            try:
                rv = REF.util.dtype_change_float(dt, basis)
                r_err = None
            except ValueError:
                rv, r_err = None, ValueError
            try:
                gv = OURS.util.dtype_change_float(dt, basis)
                g_err = None
            except ValueError:
                gv, g_err = None, ValueError
            if r_err is not g_err or (
                r_err is None and np.dtype(rv) != np.dtype(gv)
            ):
                raise AssertionError(
                    f'dtype_change_float({dt}, {basis}): {rv or r_err} vs {gv or g_err}'
                )

    # sliding_window_output_shape on random shapes
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(rng.integers(4, 20)) for _ in range(ndim))
    axis = int(rng.integers(0, ndim))
    win = int(rng.integers(1, shape[axis] + 1))
    params = dict(shape=shape, win=win, axis=axis)
    r = REF.util.sliding_window_output_shape(shape, (win,), axis)
    g = OURS.util.sliding_window_output_shape(shape, (win,), axis)
    if tuple(r) != tuple(g):
        raise AssertionError(f'sliding_window_output_shape {params}: {r} vs {g}')

    # iter_along_axes: identical index-tuple streams
    x = np.zeros(shape)
    for axes in (None, (axis,), tuple(range(ndim))):
        r = list(REF.util.iter_along_axes(x, axes))
        g = list(OURS.util.iter_along_axes(x, axes))
        if r != g:
            raise AssertionError(f'iter_along_axes {params} axes={axes}: {r} vs {g}')

    # grouped_slices_along_axis: identical ordered slice grids
    max_size = int(rng.choice([16, 64, 256]))
    r = REF.util.grouped_slices_along_axis(shape, max_size, axis)
    g = OURS.util.grouped_slices_along_axis(shape, max_size, axis)
    if [tuple(t) for t in r] != [tuple(t) for t in g]:
        raise AssertionError(
            f'grouped_slices_along_axis {params} max={max_size}: {r} vs {g}'
        )


def fuzz_figure_helpers(rng):
    """round_places / is_decade / contiguous_segments parity
    (reference figures.py:34-44, :284-295)."""
    import matplotlib

    matplotlib.use('Agg', force=False)
    import pandas as pd

    import iqwaveform.figures as rfig
    import iqwaveform_tpu.figures as ofig

    x = float(rng.uniform(0.001, 1e6))
    digits = int(rng.integers(0, 4))
    _agree(
        'round_places', dict(x=x, digits=digits),
        rfig.round_places(x, digits), ofig.round_places(x, digits), rtol=1e-12,
    )

    vals = np.concatenate([
        10.0 ** rng.integers(-6, 6, size=4),
        rng.uniform(0.1, 100, size=4),
    ])
    r = rfig.is_decade(vals)
    g = ofig.is_decade(vals)
    if not np.array_equal(np.asarray(r), np.asarray(g)):
        raise AssertionError(f'is_decade({vals}): {r} vs {g}')

    # contiguous_segments: a monotonic index with injected gaps
    n = int(rng.integers(10, 60))
    step = float(rng.choice([0.5, 1.0, 2.0]))
    idx = np.arange(n) * step
    for pos in rng.choice(np.arange(1, n), size=int(rng.integers(0, 3)), replace=False):
        idx[pos:] += step * float(rng.integers(10, 30))
    df = pd.DataFrame(
        {'v': rng.standard_normal(n)},
        index=pd.Index(idx, name='time'),
    )
    params = dict(n=n, step=step)
    rsegs = rfig.contiguous_segments(df, 'time')
    gsegs = ofig.contiguous_segments(df, 'time')
    if len(rsegs) != len(gsegs):
        raise AssertionError(
            f'contiguous_segments {params}: {len(rsegs)} vs {len(gsegs)} segments'
        )
    for i, (rs, gs) in enumerate(zip(rsegs, gsegs)):
        _agree(f'contiguous_segments[{i}]', params, rs['v'], gs['v'], rtol=0, atol=0)


def fuzz_sigmf_metadata(rng):
    """read_sigmf_metadata / extract_ntia_calibration_metadata /
    resample_iq parity (reference io.py:13-55, :150-152)."""
    import json
    import os
    import tempfile

    n_caps = int(rng.integers(1, 5))
    fs = float(rng.choice([1e6, 10e6, 122.88e6]))
    with_cal = bool(rng.integers(0, 2))
    params = dict(n_caps=n_caps, fs=fs, with_cal=with_cal)
    meta = {
        'global': {'core:sample_rate': fs},
        'captures': [
            {
                'core:sample_start': i * 100,
                'core:frequency': 1e9 + i * 1e8,
                'core:datetime': f't{i}',
            }
            for i in range(n_caps)
        ],
        'annotations': (
            [
                {
                    'ntia-core:annotation_type': 'CalibrationAnnotation',
                    'ntia-sensor:temperature': 21.5,
                    'ntia-sensor:noise_figure_sensor': 7.0,
                    'ntia-sensor:gain_preselector': 11.0,
                }
            ]
            if with_cal
            else []
        ),
    }
    if with_cal:
        r_cal = REF.io.extract_ntia_calibration_metadata(meta)
        g_cal = OURS.io.extract_ntia_calibration_metadata(meta)
        if r_cal != g_cal:
            raise AssertionError(f'ntia_calibration {params}: {r_cal} vs {g_cal}')
    with tempfile.TemporaryDirectory() as d:
        mp = os.path.join(d, 'cap.sigmf-meta')
        with open(mp, 'w') as fd:
            json.dump(meta, fd)
        r = REF.io.read_sigmf_metadata(mp, ntia=with_cal)
        g = OURS.io.read_sigmf_metadata(mp, ntia=with_cal)
        if len(r) != len(g):
            raise AssertionError(f'read_sigmf_metadata {params}: arity {len(r)} vs {len(g)}')
        for i, (rv, gv) in enumerate(zip(r, g)):
            if rv != gv:
                raise AssertionError(
                    f'read_sigmf_metadata[{i}] {params}: {rv!r} vs {gv!r}'
                )

    n = int(rng.integers(32, 257))
    scale = float(rng.choice([0.5, 2.0, 1.25]))
    x = _iq(rng, n)
    Ts = 1e-6
    r_y, r_Ts = REF.io.resample_iq(x, Ts, scale)
    g_y, g_Ts = OURS.io.resample_iq(x, Ts, scale)
    _agree('resample_iq', dict(n=n, scale=scale), r_y, g_y, rtol=1e-4)
    if r_Ts != g_Ts:
        raise AssertionError(f'resample_iq[Ts]: {r_Ts} vs {g_Ts}')


def fuzz_gamma_qq(rng):
    """contract-level comparison of the (re-derived) GammaQQ tick
    locator + formatter against the reference cluster.

    Exact tick positions are NOT required to match — the candidate
    generation was deliberately re-derived (VERDICT r2 #1) — but both
    must honor the same contract: ticks inside the clamped view, sorted
    unique, bounded count, 0.5 kept when visible, and identical labels
    on the canonical preferred values. (The reference formatter rounds
    0.95 to the label "0.9"; such lossy labels are excluded here and
    not reproduced.)
    """
    import matplotlib

    matplotlib.use('Agg', force=False)
    import matplotlib.pyplot as plt

    import iqwaveform.figures as rfig
    import iqwaveform_tpu.figures as ofig

    k = int(rng.choice([2, 4, 10, 16]))
    nbins = int(rng.integers(6, 12))
    vmin = float(rng.choice([1e-9, 1e-6, 1e-4, 0.01]))
    vmax = 1.0 - float(rng.choice([1e-6, 1e-3, 0.01]))
    params = dict(k=k, nbins=nbins, vmin=vmin, vmax=vmax)

    def ticks_for(scale_cls):
        fig, ax = plt.subplots()
        try:
            s = scale_cls(ax.xaxis, k=k, major_ticks=nbins)
            loc = s._major_locator
            loc.axis = ax.xaxis
            ax.xaxis.set_view_interval(vmin, vmax, True)
            ax.xaxis.set_data_interval(vmin, vmax, True)
            return np.asarray(loc.tick_values(vmin, vmax))
        finally:
            plt.close(fig)

    rt = ticks_for(rfig.GammaQQScale)
    gt = ticks_for(ofig.GammaQQScale)
    for name, t in [('ref', rt), ('ours', gt)]:
        if not np.all(np.diff(t) > 0):
            raise AssertionError(f'gamma-qq[{name}] {params}: unsorted ticks {t}')
        if t.min() < vmin - 1e-12 or t.max() > vmax + 1e-12:
            raise AssertionError(f'gamma-qq[{name}] {params}: ticks out of view {t}')
    if len(gt) > nbins + 1:
        raise AssertionError(f'gamma-qq {params}: {len(gt)} ticks > nbins+1')
    if vmin < 0.5 < vmax and 0.5 in rt and 0.5 not in gt:
        raise AssertionError(f'gamma-qq {params}: 0.5 visible but not kept: {gt}')

    rfmt = rfig.GammaLogitFormatter(one_half='0.5')
    gfmt = ofig.GammaLogitFormatter(one_half='0.5')
    canonical = [0.5, 0.9, 0.99, 1e-2, 1e-4, 1e-7, 1 - 1e-3, 1 - 1e-5]
    for v in canonical:
        if rfmt(v) != gfmt(v):
            raise AssertionError(
                f'gamma-qq formatter({v}): {rfmt(v)!r} vs {gfmt(v)!r}'
            )


FUZZERS = [
    fuzz_db_transforms,
    fuzz_unit_transforms,
    fuzz_stft,
    fuzz_istft,
    fuzz_spectrogram,
    fuzz_psd,
    fuzz_resample,
    fuzz_ola_filter,
    fuzz_upfirdn,
    fuzz_bin_power,
    fuzz_cyclic_power,
    fuzz_ccdf,
    fuzz_histogram_last_axis,
    fuzz_framing,
    fuzz_design_cola,
    fuzz_enbw,
    fuzz_fftfreq,
    fuzz_pss_sss,
    fuzz_corr_at_indices,
    fuzz_phy,
    fuzz_extra_windows,
    fuzz_ofdm_helpers,
    fuzz_oaconvolve,
    fuzz_oaresample,
    fuzz_iq_to_stft_spectrogram,
    fuzz_downsample_stft,
    fuzz_stft_fir_lowpass,
    fuzz_waveform_to_frame,
    fuzz_binned_mean,
    fuzz_dblin,
    fuzz_window_solver,
    fuzz_power_histogram_along_axis,
    fuzz_symbol_decoder,
    fuzz_clock_sync_estimate,
    fuzz_domain_binned_cyclic,
    fuzz_phy802_16,
    fuzz_util_helpers,
    fuzz_fft_wrappers,
    fuzz_call_by_block,
    fuzz_read_sigmf,
    fuzz_design_fir_lpf,
    fuzz_unstack_series_to_bins,
    fuzz_sss_params,
    fuzz_design_fir_resampler,
    fuzz_util_misc,
    fuzz_figure_helpers,
    fuzz_sigmf_metadata,
    fuzz_gamma_qq,
]


def run(n_cases, seed, fuzzers=FUZZERS, max_failures=20):
    failures = []
    for i in range(n_cases):
        for fz in fuzzers:
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
                failures.append(
                    f'[case {i}] {fz.__name__} CRASH:\n'
                    + traceback.format_exc(limit=8)
                )
                print(failures[-1], flush=True)
            if len(failures) >= max_failures:
                return failures
        if (i + 1) % 10 == 0:
            print(f'{i + 1}/{n_cases} cases ok so far', flush=True)
    return failures


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    failures = run(n_cases, seed)
    if failures:
        print(f'{len(failures)} failures')
        sys.exit(1)
    print(
        f'fuzz vs reference: {n_cases} cases x {len(FUZZERS)} fuzzers all passed'
    )


if __name__ == '__main__':
    main()
