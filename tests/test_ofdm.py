"""OFDM numerology / sync / decoder tests.

Oracles: 3GPP-defined constants (sequence lengths, CP structure), a
float64 numpy reimplementation of the reference corr kernel semantics
(_jit/cpu.py:6-42), and physical invariants (CP correlation peak at the
true offset).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from iqwaveform_tpu import ofdm

from conftest import make_tone_noise
from _synth import make_cp_waveform


def oracle_corr_at_indices(flat_inds, x, nfft, ncp, norm):
    """float64 port of the reference kernel semantics (_jit/cpu.py:6-42)."""
    x = x.astype('complex128')
    out = np.zeros(nfft + ncp, dtype='complex128')
    for j in range(nfft + ncp):
        ix = flat_inds + j
        ok = (ix + nfft) < x.shape[0]
        a = np.where(ok, x[np.minimum(ix, x.shape[0] - 1)], 0)
        b = np.where(ok, x[np.minimum(ix + nfft, x.shape[0] - 1)], 0)
        corr = (a * b.conj()).sum()
        if norm:
            pa = (np.abs(a) ** 2).sum()
            pb = (np.abs(b) ** 2).sum()
            corr /= np.sqrt(pa * pb)
        else:
            corr /= flat_inds.shape[0]
        out[j] = corr
    return out


# --- sequences ---


def test_pss_m_sequence_properties():
    for nid2 in range(3):
        seq = ofdm._pss_m_sequence(nid2)
        assert len(seq) == 127
        assert set(seq) == {-1, 1}
    # distinct sequences for distinct ids
    assert ofdm._pss_m_sequence(0) != ofdm._pss_m_sequence(1)


def test_sss_m_sequence_properties():
    seq = ofdm._sss_m_sequence(0)
    assert len(seq) == 127
    assert set(seq) <= {-1, 1}
    assert ofdm._sss_m_sequence(5) != ofdm._sss_m_sequence(6)


def test_pss_5g_nr_shapes_and_cp():
    fs = 15.36e6
    scs = 15e3
    pss = ofdm.pss_5g_nr(sample_rate=fs, subcarrier_spacing=scs)
    nfft = round(fs / scs)
    cp = round(9 * fs / scs / 128)
    assert pss.shape == (3, nfft + cp)
    # cp region zero-padded (reference ofdm.py:249-257 zero-pads)
    assert np.abs(np.asarray(pss)[:, :cp]).max() == 0


def test_pss_correlation_detects_nid2():
    """a PSS embedded in noise is detected by correlating with the bank."""
    fs = 3.84e6
    scs = 30e3
    pss = np.asarray(ofdm.pss_5g_nr(sample_rate=fs, subcarrier_spacing=scs, pad_cp=False))
    rng = np.random.default_rng(0)
    n = 4096
    x = 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    offset = 1000
    # the generated sequences carry unit *frequency-domain* energy
    # (~1/nfft in time); scale up for a strong-signal embedding
    x[offset : offset + pss.shape[1]] += 20 * pss[1]
    x = x.astype('complex64')

    scores = []
    for k in range(3):
        c = np.correlate(x, pss[k], mode='valid')
        scores.append(np.abs(c).max())
    assert int(np.argmax(scores)) == 1
    best = np.abs(np.correlate(x, pss[1], mode='valid'))
    assert best.argmax() == offset


def test_pss_params_case_a():
    p = ofdm.pss_params(sample_rate=15.36e6, subcarrier_spacing=15e3)
    assert p.symbol_indexes == [2, 8, 16, 22, 30, 36, 44, 50]
    assert p.frames_per_sync == 2
    assert p.frame_size == round(10e-3 * 15.36e6)


def test_pss_params_case_b():
    # TS 38.213 §4.1 Case B: {4, 8, 16, 20} + 28·n, n ∈ {0, 1} for the
    # maximal FR1 pattern; 30 kHz SCS only, no shared-spectrum variant
    p = ofdm.pss_params(
        sample_rate=30.72e6, subcarrier_spacing=30e3, case='B'
    )
    assert p.symbol_indexes == [4, 8, 16, 20, 32, 36, 44, 48]
    assert p.slot_count == 4
    s = ofdm.sss_params(
        sample_rate=30.72e6, subcarrier_spacing=30e3, case='B'
    )
    assert s.symbol_indexes == [i + 2 for i in p.symbol_indexes]
    with pytest.raises(ValueError):
        ofdm.pss_params(
            sample_rate=15.36e6, subcarrier_spacing=15e3, case='B'
        )
    with pytest.raises(ValueError):
        ofdm.pss_params(
            sample_rate=30.72e6,
            subcarrier_spacing=30e3,
            case='B',
            shared_spectrum=True,
        )
    # the default mapping is unchanged: 30 kHz -> Case C
    c = ofdm.pss_params(sample_rate=30.72e6, subcarrier_spacing=30e3)
    assert c.symbol_indexes == [2, 8, 16, 22, 30, 36, 44, 50]


def test_sss_params_offsets():
    p = ofdm.pss_params(sample_rate=15.36e6, subcarrier_spacing=15e3)
    s = ofdm.sss_params(sample_rate=15.36e6, subcarrier_spacing=15e3)
    assert s.symbol_indexes == [i + 2 for i in p.symbol_indexes]


# --- numerology ---


def test_phy3gpp_lte10():
    phy = ofdm.Phy3GPP(10e6)
    assert phy.sample_rate == 15.36e6
    assert phy.nfft == 1024
    assert phy.subcarriers == 601
    # one slot: 14 symbols + CPs = contiguous_size
    cps = np.asarray(phy.cp_sizes)
    assert cps.tolist() == [80, 72, 72, 72, 72, 72, 72, 80, 72, 72, 72, 72, 72, 72]
    assert phy.contiguous_size == cps.sum() + 14 * 1024
    # cp_idx and symbol_idx partition the contiguous range
    assert len(phy.cp_idx) + len(phy.symbol_idx) == phy.contiguous_size


def test_phy3gpp_index_cyclic_prefix():
    phy = ofdm.Phy3GPP(10e6)
    inds = phy.index_cyclic_prefix(symbols=(0, 1), slots=(0,))
    assert inds.shape == (2, 72)
    np.testing.assert_array_equal(inds[0], np.arange(72))
    assert inds[1][0] == phy.cp_start_idx[1]


def test_phy3gpp_validation():
    with pytest.raises(ValueError):
        ofdm.Phy3GPP(10e6, subcarrier_spacing=20e3)
    with pytest.raises(ValueError):
        ofdm.Phy3GPP(10e6, sample_rate=15.361e6)


def test_phy802_16():
    phy = ofdm.Phy802_16(10e6)
    assert phy.nfft == 2048
    assert phy.sampling_factor == 28 / 25
    # 5 ms frame / (2304 samples / 11.2 MS/s) = 24.3 -> 24 whole symbols
    assert phy.symbols_per_frame == 24
    assert phy.cp_start_idx.shape == (phy.symbols_per_frame,)

    inds = phy.index_cyclic_prefix(symbols=(0, 1))
    assert inds.shape[-1] == int(phy.cp_sizes[1])


def test_phy802_16_validation():
    with pytest.raises(ValueError):
        ofdm.Phy802_16(10e6, nfft=333)
    with pytest.raises(ValueError):
        ofdm.Phy802_16(10e6, cp_ratio=0.3)
    with pytest.raises(ValueError):
        ofdm.Phy802_16(1e6)
    with pytest.raises(TypeError):
        ofdm.Phy802_16('10MHz')


# --- correlation kernels ---


@pytest.mark.parametrize('norm', [True, False])
def test_corr_at_indices_matches_oracle(norm):
    phy = ofdm.Phy3GPP(1.4e6)  # small: nfft=128
    wave = make_cp_waveform(phy, n_slots=3)
    inds = phy.index_cyclic_prefix(slots=(0,))
    flat = np.asarray(inds).reshape(-1)
    ncp = inds.shape[-1]

    expected = oracle_corr_at_indices(flat, wave, phy.nfft, ncp, norm)
    ours = np.asarray(ofdm.corr_at_indices(inds, wave, phy.nfft, norm=norm))
    np.testing.assert_allclose(ours, expected, atol=2e-3 if norm else 2e-3)


@pytest.mark.parametrize('norm', [True, False])
def test_corr_at_indices_jax_matches_numpy(norm):
    phy = ofdm.Phy3GPP(1.4e6)
    wave = make_cp_waveform(phy, n_slots=3)
    inds = phy.index_cyclic_prefix(slots=(0,))
    a = np.asarray(ofdm.corr_at_indices(inds, wave, phy.nfft, norm=norm))
    b = np.asarray(ofdm.corr_at_indices(inds, jnp.asarray(wave), phy.nfft, norm=norm))
    np.testing.assert_allclose(b, a, atol=2e-3)


def test_corr_at_indices_peak_at_alignment():
    """CP correlation must peak at lag 0 for an aligned CP waveform."""
    phy = ofdm.Phy3GPP(5e6)
    wave = make_cp_waveform(phy, n_slots=6)
    inds = phy.index_cyclic_prefix(slots=(0, 1, 2))
    corr = np.abs(np.asarray(ofdm.corr_at_indices(inds, wave, phy.nfft)))
    assert corr.argmax() == 0
    assert corr[0] > 0.99
    assert np.median(corr[10:-10]) < 0.2


def test_corr_at_indices_unstructured_fallback():
    """non-contiguous index rows take the direct path; must still match."""
    phy = ofdm.Phy3GPP(1.4e6)
    wave = make_cp_waveform(phy, n_slots=3)
    rng = np.random.default_rng(0)
    inds = np.sort(rng.choice(2000, size=(4, 16), replace=False), axis=1)
    expected = oracle_corr_at_indices(inds.reshape(-1), wave, phy.nfft, 16, True)
    ours = np.asarray(ofdm.corr_at_indices(inds, wave, phy.nfft, norm=True))
    np.testing.assert_allclose(ours, expected, atol=2e-3)


def test_correlate_along_axis():
    rng = np.random.default_rng(0)
    a = (rng.standard_normal((8, 5)) + 1j * rng.standard_normal((8, 5))).astype(
        'complex64'
    )
    b = (rng.standard_normal((8, 5)) + 1j * rng.standard_normal((8, 5))).astype(
        'complex64'
    )
    out0 = ofdm.correlate_along_axis(a, b, axis=0)
    expected0 = np.array([np.vdot(a[:, i], b[:, i]) for i in range(5)])
    np.testing.assert_allclose(out0, expected0, atol=1e-5)

    out1 = ofdm.correlate_along_axis(a, b, axis=1)
    expected1 = np.array([np.vdot(a[i], b[i]) for i in range(8)])
    np.testing.assert_allclose(out1, expected1, atol=1e-5)


def test_subsample_shift():
    """integer shift equals a roll times the (-1)^shift global phase that
    the reference's fftshift'd frequency ramp introduces (ofdm.py:53-61)."""
    x = make_tone_noise(256, snr_db=40)
    y = ofdm.subsample_shift(x, 3.0)
    np.testing.assert_allclose(np.asarray(y), -np.roll(x, 3), atol=1e-3)
    y2 = ofdm.subsample_shift(x, 4.0)
    np.testing.assert_allclose(np.asarray(y2), np.roll(x, 4), atol=1e-3)


def test_indexsum2d():
    out = ofdm.indexsum2d(np.array([0, 10]), np.array([1, 2, 3]))
    np.testing.assert_array_equal(out, [[1, 2, 3], [11, 12, 13]])


def test_call_by_block():
    x = np.arange(10.0)
    out = ofdm.call_by_block(lambda c: c * 2, x, 3)
    np.testing.assert_allclose(out, np.arange(9) * 2.0)


# --- decoder / synchronizer ---


def test_symbol_decoder_roundtrip():
    """QPSK symbols placed on 3GPP subcarriers must decode back."""
    phy = ofdm.Phy3GPP(5e6)  # nfft=512
    rng = np.random.default_rng(0)
    n_sym_total = 28 * 4  # 4 slots worth

    qpsk = (
        rng.choice([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j], size=(n_sym_total, phy.nfft))
    ) / np.sqrt(2)
    # zero outside 3gpp subcarriers, zero DC-ish edges consistent w/ decode trim
    wave = []
    cps = np.asarray(phy.cp_sizes)
    X = np.fft.ifftshift(qpsk, axes=1)
    tdom = np.fft.ifft(X, axis=1) * np.sqrt(2 * phy.nfft)
    for i, s in enumerate(tdom):
        wave += [s[-cps[i % 14] :], s]
    wave = np.concatenate(wave).astype('complex64')

    dec = ofdm.SymbolDecoder(5e6)
    syms = np.asarray(dec._decode_symbols(wave, only_3gpp_subcarriers=False))
    # the decoder blocks by 2 slots and strips CPs with the 1-slot symbol
    # index table (reference ofdm.py:1077), so it decodes the first slot of
    # each 2-slot block: rows [0:14], [28:42], ...
    sel = np.concatenate([np.arange(b * 28, b * 28 + 14) for b in range(4)])
    assert syms.shape[0] == sel.size
    err = np.abs(syms - qpsk[sel]).max()
    assert err < 1e-3


def test_clock_synchronizer_construction():
    sync = ofdm.BasebandClockSynchronizer(1.4e6)
    assert sync.phy.nfft == 128
    assert sync.cp_indices_coarse.ndim == 2
    assert sync.cp_indices_fine.ndim == 2


def test_clock_synchronizer_finds_offset():
    """_find_slot_start_offset must recover a known slot misalignment."""
    sync = ofdm.BasebandClockSynchronizer(1.4e6, correlation_subframes=4)
    phy = sync.phy
    true_offset = 37
    wave = make_cp_waveform(phy, n_slots=10)
    chunk = wave[phy.contiguous_size - true_offset :][
        : sync.cp_indices_coarse.max() + phy.nfft + 1
    ]
    offset, weight, noise = sync._find_slot_start_offset(chunk)
    # offset + position mod slot should recover alignment within coarse step
    assert abs(((offset - true_offset) % phy.contiguous_size)) <= 2 or abs(
        ((true_offset - offset) % phy.contiguous_size)
    ) <= 2


def test_clock_synchronizer_end_to_end():
    """a waveform with a simulated clock slip must converge through the
    iterative resample correction loop (reference ofdm.py:978-1045)."""
    from iqwaveform_tpu import fourier

    sync = ofdm.BasebandClockSynchronizer(1.4e6, correlation_subframes=8)
    phy = sync.phy

    n_slots = 170
    x = make_cp_waveform(phy, n_slots=n_slots)

    # simulate a clock mismatch: stretch by `slip` samples over the capture
    slip = 24
    y = np.asarray(fourier.resample(x, x.size - slip))

    out = sync(y, subsample_offset_correction=False, max_passes=8)

    # converged: the recorded final pass found no remaining sample slip
    assert sync._regression_info['slipped_samples'] == 0
    # output trimmed to whole 2-slot blocks
    assert out.size % (2 * phy.contiguous_size) == 0
    assert out.size > 0


def test_corr_at_indices_802_16():
    """CP correlation with the 802.16 index table peaks at alignment."""
    phy = ofdm.Phy802_16(5e6, nfft=128, frame_duration=2e-3)
    rng = np.random.default_rng(0)
    cps = np.asarray(phy.cp_sizes)
    # one frame of CP-structured symbols + silence padding to frame_size
    wave = []
    for i in range(phy.symbols_per_frame):
        s = (rng.standard_normal(phy.nfft) + 1j * rng.standard_normal(phy.nfft))
        wave += [s[-cps[i] :], s]
    body = np.concatenate(wave)
    pad = phy.frame_size - body.size
    wave = np.concatenate([body, np.zeros(max(pad, 0))] * 2).astype('complex64')

    inds = phy.index_cyclic_prefix(symbols=np.arange(8))
    corr = np.abs(np.asarray(ofdm.corr_at_indices(inds, wave, phy.nfft)))
    assert corr.argmax() == 0
    assert corr[0] > 0.9


def test_clock_synchronizer_device_path_matches_numpy():
    """the jitted batched offset finder (the axon-safe device path) must
    reproduce the host path's per-window estimates and converge through
    the same end-to-end loop on jax input."""
    import jax.numpy as jnp

    from iqwaveform_tpu import fourier

    sync = ofdm.BasebandClockSynchronizer(1.4e6, correlation_subframes=8)
    phy = sync.phy
    x = make_cp_waveform(phy, n_slots=170)
    slip = 24
    y = np.asarray(fourier.resample(x, x.size - slip))

    est_np = sync._offset_by_sync_period(y)
    est_dev = sync._offset_by_sync_period(jnp.asarray(y))
    assert est_dev.shape == est_np.shape
    np.testing.assert_allclose(est_dev[:, 0], est_np[:, 0], atol=0)
    np.testing.assert_allclose(est_dev[:, 1:], est_np[:, 1:], rtol=1e-4)

    out = sync(jnp.asarray(y), subsample_offset_correction=False, max_passes=8)
    assert sync._regression_info['slipped_samples'] == 0
    out = np.asarray(out)
    assert out.size % (2 * phy.contiguous_size) == 0 and out.size > 0


def test_symbol_decoder_device_path_matches_numpy():
    import jax.numpy as jnp

    phy = ofdm.Phy3GPP(5e6)
    rng = np.random.default_rng(1)
    n_sym_total = 28 * 4
    qpsk = (
        rng.choice([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j], size=(n_sym_total, phy.nfft))
    ) / np.sqrt(2)
    cps = np.asarray(phy.cp_sizes)
    tdom = np.fft.ifft(np.fft.ifftshift(qpsk, axes=1), axis=1) * np.sqrt(
        2 * phy.nfft
    )
    wave = []
    for i, s in enumerate(tdom):
        wave += [s[-cps[i % 14] :], s]
    wave = np.concatenate(wave).astype('complex64')

    dec = ofdm.SymbolDecoder(5e6)
    sym_np = np.asarray(dec(wave))
    sym_dev = np.asarray(dec(jnp.asarray(wave)))
    assert sym_dev.shape == sym_np.shape
    np.testing.assert_allclose(sym_dev, sym_np, atol=2e-4)
