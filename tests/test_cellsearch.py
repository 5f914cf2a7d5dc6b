"""5G cell-search model tests (synthetic embedded PSS/SSS)."""

import numpy as np
import pytest

from iqwaveform_tpu.models import CellSearch
from iqwaveform_tpu.models import ofdm


@pytest.fixture(scope='module')
def search():
    return CellSearch(3.84e6, 30e3)


def make_capture(search, n_id2, n_id1, offset, snr_amp=20, seed=0, n=20000):
    fs, scs = search.sample_rate, search.subcarrier_spacing
    rng = np.random.default_rng(seed)
    x = 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))

    pss = np.asarray(ofdm.pss_5g_nr(fs, scs, pad_cp=False))
    sss = np.asarray(ofdm.sss_5g_nr(fs, scs, pad_cp=False))
    n_id = 3 * n_id1 + n_id2

    x[offset : offset + pss.shape[1]] += snr_amp * pss[n_id2]
    s0 = offset + search.sss_stride
    x[s0 : s0 + sss.shape[1]] += snr_amp * sss[n_id]
    return x.astype('complex64'), n_id


@pytest.mark.parametrize('n_id2,n_id1,offset', [(0, 7, 3000), (1, 100, 5000), (2, 335, 12000)])
def test_cell_search_recovers_identity(search, n_id2, n_id1, offset):
    x, n_id = make_capture(search, n_id2, n_id1, offset)
    r = search(x)
    assert r.n_id2 == n_id2
    assert r.offset == offset
    assert r.n_id == n_id
    assert r.peak > 0.5
    assert r.sss_peak > 0.5


def test_cell_search_pss_only(search):
    x, _ = make_capture(search, 1, 50, 4000)
    r = search(x, search_sss=False)
    assert r.n_id is None
    assert r.n_id2 == 1


def test_cell_search_short_capture_skips_sss(search):
    # PSS near the capture end: its SSS symbol would extend past EOF
    rng = np.random.default_rng(0)
    n = 19550
    offset = 19300
    x = 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    pss = np.asarray(
        ofdm.pss_5g_nr(search.sample_rate, search.subcarrier_spacing, pad_cp=False)
    )
    x[offset : offset + pss.shape[1]] += 20 * pss[0]
    r = search(x.astype('complex64'))
    assert r.offset == offset
    assert r.n_id is None


def test_cell_search_noise_only_low_peak(search):
    rng = np.random.default_rng(1)
    x = (0.05 * (rng.standard_normal(20000) + 1j * rng.standard_normal(20000))).astype(
        'complex64'
    )
    r = search(x, search_sss=False)
    # normalized noise correlation stays well below true-signal peaks (~0.9)
    assert r.peak < 0.5
