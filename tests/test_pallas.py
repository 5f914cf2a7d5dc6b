"""Pallas kernel tests (interpreter mode on the CPU mesh).

Oracles: scipy.signal.upfirdn and the XLA corr_at_indices formulation.
Real-TPU compiled-mode validation runs in scripts/validate_tpu.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from iqwaveform_tpu import ofdm
from iqwaveform_tpu.ops.pallas.corr_pallas import corr_at_indices_pallas
from iqwaveform_tpu.ops.pallas.upfirdn_pallas import (
    build_polyphase_matrix,
    upfirdn_pallas,
)

from test_ofdm import make_cp_waveform


@pytest.mark.parametrize('up,down', [(1, 1), (2, 3), (3, 1), (1, 4), (7, 5)])
def test_upfirdn_pallas_matches_scipy(up, down):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(500).astype('float32')
    h = scipy.signal.firwin(33, 0.4).astype('float32')
    expected = scipy.signal.upfirdn(
        h.astype('float64'), x.astype('float64'), up=up, down=down
    )
    got = np.asarray(upfirdn_pallas(h, x, up, down, interpret=True))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_upfirdn_pallas_complex():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(300) + 1j * rng.standard_normal(300)).astype('complex64')
    h = (rng.standard_normal(21) + 1j * rng.standard_normal(21)).astype('complex64')
    expected = scipy.signal.upfirdn(
        h.astype('complex128'), x.astype('complex128'), up=2, down=3
    )
    got = np.asarray(upfirdn_pallas(h, x, 2, 3, interpret=True))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_upfirdn_pallas_batched():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 200)).astype('float32')
    h = scipy.signal.firwin(17, 0.3).astype('float32')
    expected = scipy.signal.upfirdn(
        h.astype('float64'), x.astype('float64'), up=2, down=5, axis=1
    )
    got = np.asarray(upfirdn_pallas(h, x, 2, 5, interpret=True))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_build_polyphase_matrix_identity():
    # up=down=1: W reduces to the (reversed) tap vector acting as FIR
    h = np.array([1.0, 2.0, 3.0], dtype='float32')
    W, Lin, Lout, pad = build_polyphase_matrix(h, 1, 1)
    assert (Lin, Lout, pad) == (1, 1, 2)
    np.testing.assert_array_equal(W[0], [3.0, 2.0, 1.0])


@pytest.mark.parametrize('norm', [True, False])
def test_corr_pallas_matches_xla(norm):
    phy = ofdm.Phy3GPP(1.4e6)
    wave = make_cp_waveform(phy, n_slots=3)
    inds = phy.index_cyclic_prefix(slots=(0,))
    starts = np.asarray(inds).reshape(-1, inds.shape[-1])[:, 0]
    ncp = inds.shape[-1]

    ref = np.asarray(ofdm.corr_at_indices(inds, wave, phy.nfft, norm=norm))
    got = np.asarray(
        corr_at_indices_pallas(
            starts, wave, phy.nfft, ncp, norm=norm, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_corr_pallas_peak_at_alignment():
    phy = ofdm.Phy3GPP(1.4e6)
    wave = make_cp_waveform(phy, n_slots=4)
    inds = phy.index_cyclic_prefix(slots=(0, 1))
    starts = np.asarray(inds).reshape(-1, inds.shape[-1])[:, 0]
    ncp = inds.shape[-1]

    corr = np.abs(
        np.asarray(
            corr_at_indices_pallas(starts, wave, phy.nfft, ncp, interpret=True)
        )
    )
    assert corr.argmax() == 0
    assert corr[0] > 0.99


def test_histogram_edge_counts_pallas_matches_sort():
    """direct edge-compare kernel (interpret on CPU) must produce
    identical counts to the sort+searchsorted path, including values at,
    below, and above the edge range."""
    from iqwaveform_tpu.ops.pallas.hist_pallas import (
        histogram_edge_counts_pallas,
    )
    from iqwaveform_tpu.ops.power import histogram_edge_counts

    rng = np.random.default_rng(0)
    edges = np.sort(rng.standard_normal(96)).astype('float32')
    # include exact edge values (boundary semantics) and out-of-range
    vals = np.concatenate([
        rng.standard_normal(3000),
        edges[::7],
        [-100.0, 100.0],
    ]).astype('float32')

    ref = np.asarray(histogram_edge_counts(jnp.asarray(vals), edges))
    got = np.asarray(histogram_edge_counts_pallas(jnp.asarray(vals), edges))
    np.testing.assert_array_equal(ref, got)


def test_binned_mean_matmul_matches_reshape():
    from iqwaveform_tpu.ops.power import binned_mean_matmul

    rng = np.random.default_rng(1)
    for navg, n in ((16, 128 * 16 * 7), (4, 128 * 4 * 3), (5, 777 * 5)):
        p = jnp.asarray(rng.standard_normal(n).astype('float32') ** 2)
        ref = np.asarray(p.reshape(-1, navg).mean(axis=1))
        got = np.asarray(binned_mean_matmul(p, navg))
        np.testing.assert_allclose(got, ref, rtol=2e-6)


def test_columnwise_histogram_pallas_matches_sort():
    """hi/lo one-hot matmul histogram vs the sort+searchsorted path:
    totals exact; any per-bin differences are edge-rounding transfers
    between adjacent bins only."""
    from iqwaveform_tpu.ops.pallas.colhist_pallas import (
        columnwise_histogram_pallas,
    )
    from iqwaveform_tpu.parallel.sharded import columnwise_histogram

    rng = np.random.default_rng(0)
    for shape, nb in [((1000, 77), 64), ((4096, 256), 1024), ((513, 130), 100)]:
        vals = (rng.standard_normal(shape) * 30 - 50).astype('float32')
        edges = np.linspace(-150.0, 50.0, nb + 1).astype('float32')
        ref = np.asarray(columnwise_histogram(jnp.asarray(vals), edges))
        got = np.asarray(
            columnwise_histogram_pallas(jnp.asarray(vals), edges, interpret=True)
        )
        np.testing.assert_array_equal(got.sum(axis=1), ref.sum(axis=1))
        # boundary-rounding can move a sample to a neighboring bin; the
        # cumulative distributions may then differ transiently by that
        # sample, never more
        cum_diff = np.abs(np.cumsum(got, axis=1) - np.cumsum(ref, axis=1))
        assert cum_diff.max() <= 2, cum_diff.max()


def test_columnwise_histogram_pallas_exact_off_edge():
    """bin-center values (never near an edge) count identically."""
    from iqwaveform_tpu.ops.pallas.colhist_pallas import (
        columnwise_histogram_pallas,
    )
    from iqwaveform_tpu.parallel.sharded import columnwise_histogram

    rng = np.random.default_rng(1)
    nb = 256
    edges = np.linspace(-100.0, 28.0, nb + 1).astype('float32')
    centers = 0.5 * (edges[:-1] + edges[1:])
    vals = centers[rng.integers(0, nb, size=(2048, 192))].astype('float32')
    # plus out-of-range values exercising the clip bins
    vals[:7, :3] = -500.0
    vals[7:11, :3] = 500.0
    ref = np.asarray(columnwise_histogram(jnp.asarray(vals), edges))
    got = np.asarray(
        columnwise_histogram_pallas(jnp.asarray(vals), edges, interpret=True)
    )
    np.testing.assert_array_equal(got, ref)


def test_columnwise_histogram_packed():
    """slab-packed one-hot matmul histogram: exact counts vs a bincount
    oracle on the same quantization, across bin counts spanning every
    quadrant grid (QIxQJ in 1x1..2x2) and non-multiple shapes."""
    from iqwaveform_tpu.ops.pallas.colhist_pallas import (
        columnwise_histogram_packed,
    )

    rng = np.random.default_rng(2)
    for shape, nb in [
        ((256, 128), 1024),
        ((300, 200), 512),
        ((128, 128), 256),
        ((512, 130), 64),
        ((257, 64), 100),
    ]:
        vals = rng.uniform(-150, 50, size=shape).astype('float32')
        edges = np.linspace(-150.0, 50.0, nb + 1)
        # oracle on the kernel's own uniform quantization (edge-rounding
        # equivalence with searchsorted is covered by the unpacked tests)
        scale = 1.0 / (edges[1] - edges[0])
        idx = np.clip(
            np.floor((vals - edges[0]) * scale), 0, nb - 1
        ).astype(np.int64)
        ref = np.zeros((shape[1], nb), np.int64)
        for f in range(shape[1]):
            ref[f] = np.bincount(idx[:, f], minlength=nb)
        got = np.asarray(
            columnwise_histogram_packed(jnp.asarray(vals), edges, interpret=True)
        )
        np.testing.assert_array_equal(got.sum(axis=1), ref.sum(axis=1))
        cum_diff = np.abs(np.cumsum(got, axis=1) - np.cumsum(ref, axis=1))
        assert cum_diff.max() <= 1, cum_diff.max()

    # bin-center values (no edge rounding) count exactly, bf16 factors too
    nb = 512
    edges = np.linspace(-100.0, 28.0, nb + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    vals = centers[rng.integers(0, nb, size=(320, 96))].astype('float32')
    vals[:5, :2] = -500.0
    vals[5:9, :2] = 500.0
    scale = 1.0 / (edges[1] - edges[0])
    idx = np.clip(np.floor((vals - edges[0]) * scale), 0, nb - 1).astype(np.int64)
    ref = np.zeros((96, nb), np.int64)
    for f in range(96):
        ref[f] = np.bincount(idx[:, f], minlength=nb)
    for fd in (jnp.int8, jnp.bfloat16):
        got = np.asarray(
            columnwise_histogram_packed(
                jnp.asarray(vals), edges, factor_dtype=fd, interpret=True
            )
        )
        np.testing.assert_array_equal(got, ref)


def test_strict_kernel_dispatch_raises(monkeypatch):
    """with strict mode on (the CI default via conftest), a failing pallas
    kernel raises instead of warning + falling back (VERDICT r2 weak #6)."""
    import pytest

    from iqwaveform_tpu.models import ofdm as ofdm_model
    from iqwaveform_tpu.ops.pallas import _common, corr_pallas

    def boom(*args, **kwargs):
        raise RuntimeError('injected kernel failure')

    monkeypatch.setattr(corr_pallas, 'corr_at_indices_pallas', boom)

    from conftest import make_tone_noise

    x = make_tone_noise(4096)
    starts = np.arange(0, 2048, 512)
    inds = starts[:, None] + np.arange(64)[None, :]

    assert _common.strict_kernels()
    with pytest.raises(RuntimeError, match='injected kernel failure'):
        ofdm_model.corr_at_indices(inds, jnp.asarray(x), 256, backend='pallas')

    # permissive mode falls back with a warning and still returns values
    _common.set_strict_kernels(False)
    try:
        with pytest.warns(UserWarning, match='falling back'):
            out = ofdm_model.corr_at_indices(
                inds, jnp.asarray(x), 256, backend='pallas'
            )
        assert np.asarray(out).shape[0] == 256 + 64  # nfft + ncp
    finally:
        _common.set_strict_kernels(True)


@pytest.mark.parametrize('skip_frac', [0.0, 0.25])
def test_chan_stats_pallas_trim(skip_frac):
    """trim-aware channel power (VERDICT r2 #3): with an analysis-bin
    trim whose channel boundaries cross factored lanes, the kernel's
    interval-mask + boundary-correction dots must match the direct
    FFT->trim->reshape->sum oracle; the full-band psd outputs are
    unaffected by the trim."""
    from iqwaveform_tpu.ops.pallas.chan_stats_pallas import (
        chan_stats_pallas,
        chan_stats_supported,
    )

    rng = np.random.default_rng(0)
    nch, fpc = 8, 256
    ana = round(fpc * (1 - skip_frac))
    nfft_big = nch * fpc  # a=16 sublane rows; 192-bin channels cross lanes
    skip = nch * (fpc - ana)
    navg = 4
    assert chan_stats_supported(nfft_big, nch, skip, navg)

    M = 8
    y = (
        rng.standard_normal(M * nfft_big) + 1j * rng.standard_normal(M * nfft_big)
    ).astype('complex64')
    wc = (np.hanning(nfft_big) / nfft_big).astype('complex64')

    out = chan_stats_pallas(
        jnp.asarray(y), nfft_big=nfft_big, channel_count=nch, window=wc,
        navg=navg, skip_bins=skip, interpret=True,
    )

    frames = y.reshape(M, nfft_big) * wc[None]
    spg = np.abs(np.fft.fft(frames, axis=1)) ** 2
    X = spg[:, skip // 2 : nfft_big - skip // 2] if skip else spg
    cp_ref = X.reshape(M, nch, ana).sum(axis=2)
    cp = np.asarray(out['channel_power'])
    assert np.abs(cp - cp_ref).max() <= 1e-5 * cp_ref.max()

    ps_ref = np.log(spg + 1e-25).sum(axis=0)
    ps = np.asarray(out['psd_log_sum'])
    assert np.abs(ps - ps_ref).max() <= 1e-4 * np.abs(ps_ref).max()
    np.testing.assert_allclose(
        np.asarray(out['psd_max']), spg.max(axis=0), rtol=1e-4
    )


def test_chan_stats_supported_trim_rules():
    from iqwaveform_tpu.ops.pallas.chan_stats_pallas import chan_stats_supported

    # config #4 shape: 64ch x 256, 192 analysis bins -> skip 4096 of 16384
    assert chan_stats_supported(16384, 64, 4096, 16)
    # odd skip rejected
    assert not chan_stats_supported(16384, 64, 4095, 16)
    # 8-bin channels with a=16 lanes still work (one interior boundary
    # per lane; the other boundaries land on lane edges)
    assert chan_stats_supported(2048, 128, 1024, 16)
    # 6-bin channels put multiple boundaries inside one lane -> rejected
    assert not chan_stats_supported(2048, 128, 1280, 16)
    # non-integral analysis bins rejected
    assert not chan_stats_supported(16384, 64, 4000, 16)


def _strided_ola_monitor():
    """flagship-shaped monitor whose strided OLA kernel is armed."""
    import jax

    from iqwaveform_tpu.models import (
        WidebandMonitor,
        design_wideband_monitor,
    )

    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=64,
        apd_navg=16, fft_backend='mxu', min_fft_size=8191,
        ola_kernel='pallas', apd_kernel='pallas', chan_kernel='pallas',
        fft_precision='high',
    )
    mon = WidebandMonitor(design)
    assert mon._strided_ola is not None
    return mon


def test_fused_ola_strided_overlap_add_and_tail():
    """the in-kernel 2:1 overlap-add + halo/tail contract: y rows are
    lo_t + hi_{t-1}, the halo operand feeds the final frame's second
    hop, and tail is that frame's dangling half (checked by running the
    kernel over the extended signal: its y continues past this one's)."""
    mon = _strided_ola_monitor()
    hop = mon.hop_in
    M = 16
    n = M * hop
    rng = np.random.default_rng(5)
    ext = jnp.asarray(rng.standard_normal((2, n + hop)).astype('float32'))
    planes, halo = ext[:, :n], ext[:, n:]

    y, tail = mon._strided_ola(
        planes, halo, n_frames=M, precision='highest'
    )
    y2, _ = mon._strided_ola(
        ext, jnp.zeros((2, hop), jnp.float32), n_frames=M + 1,
        precision='highest',
    )
    H = y.shape[0] // M
    # same first M*hop_out output rows (frame M only adds past them) ...
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2[: M * H]))
    # ... and the extended run's next row block is lo_M + tail
    assert np.abs(np.asarray(tail)).max() > 0


@pytest.mark.parametrize('fpb', [1, 5, 16, 32])
def test_fused_ola_strided_block_size_invariance(fpb):
    """grid/carry bookkeeping must not depend on frames_per_block
    (fpb=5 forces the fall-back halving to T=4, 32 the G=1 single-step
    grid at M=32)."""
    mon = _strided_ola_monitor()
    hop = mon.hop_in
    M = 32
    rng = np.random.default_rng(6)
    planes = jnp.asarray(
        rng.standard_normal((2, M * hop)).astype('float32')
    )
    halo = jnp.asarray(rng.standard_normal((2, hop)).astype('float32'))
    ref_y, ref_t = mon._strided_ola(
        planes, halo, n_frames=M, precision='highest', frames_per_block=8
    )
    y, t = mon._strided_ola(
        planes, halo, n_frames=M, precision='highest',
        frames_per_block=fpb,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y))
    np.testing.assert_allclose(np.asarray(t), np.asarray(ref_t))


def test_fused_ola_strided_vmap_matches_loop():
    """receiver-batched monitors vmap the kernel: the batching rule must
    keep the carry/halo step logic pointing at the frame-grid axis."""
    import jax

    mon = _strided_ola_monitor()
    hop = mon.hop_in
    M = 16
    rng = np.random.default_rng(7)
    planes = jnp.asarray(
        rng.standard_normal((3, 2, M * hop)).astype('float32')
    )
    halo = jnp.zeros((2, hop), jnp.float32)

    fn = lambda p: mon._strided_ola(  # noqa: E731
        p, halo, n_frames=M, precision='highest'
    )
    yv, tv = jax.vmap(fn)(planes)
    for r in range(3):
        y, t = fn(planes[r])
        np.testing.assert_allclose(np.asarray(yv[r]), np.asarray(y))
        np.testing.assert_allclose(np.asarray(tv[r]), np.asarray(t))


def test_frame_block_mosaic_invariants():
    """the (T, pad) selection must satisfy Mosaic's block rule for every
    (M, a): (M+pad) % T == 0 and ((T*a) % 8 == 0 or T == M+pad). The
    round-5 on-chip regression was nfft=512 (a=4) with M=63 odd frames:
    T halved to 1 and the (T*a, b) = (4, 128) block violated the
    8-divisibility rule. CPU interpret mode cannot catch Mosaic lowering
    failures, so this pins the math host-side."""
    from iqwaveform_tpu.ops.pallas.fused_ola_pallas import _frame_block

    for a in (1, 2, 4, 8, 16, 32, 64, 128):
        for M in list(range(1, 70)) + [252, 1023, 4096]:
            for fpb in (1, 2, 4, 8, 16):
                T, pad = _frame_block(M, a, fpb)
                Mp = M + pad
                assert Mp % T == 0, (a, M, fpb, T, pad)
                assert (T * a) % 8 == 0 or T == Mp, (a, M, fpb, T, pad)


def test_fused_ola_pallas_odd_frame_count_pad():
    """odd frame counts at small nfft (a < 8) take the zero-frame pad
    path; output must equal the MXU twin with the pad sliced off (the
    round-5 validate_tpu ola_filter regression shape: 252 frames,
    nfft=512)."""
    from iqwaveform_tpu.ops.filtering import _ola_filter_fused

    rng = np.random.default_rng(0)
    for n, nfft in [(65023, 512), (16384, 512), (130000, 1024)]:
        x = (
            rng.standard_normal(n) + 1j * rng.standard_normal(n)
        ).astype('complex64')
        kw = dict(
            nfft=nfft, nfft_out=nfft, noverlap_in=nfft // 2,
            noverlap_out=nfft // 2, window='hamming', zero_lo=10,
            zero_hi=nfft - 10, bounds_in=(0, nfft), bounds_out=(0, nfft),
        )
        yp = np.asarray(
            _ola_filter_fused(
                jnp.asarray(x), kernel='pallas', fft_precision='highest',
                **kw,
            )
        )
        ym = np.asarray(
            _ola_filter_fused(
                jnp.asarray(x), kernel='mxu', fft_precision='highest',
                **kw,
            )
        )
        err = np.abs(yp - ym).max() / np.abs(ym).max()
        assert err < 2e-5, (n, nfft, err)
