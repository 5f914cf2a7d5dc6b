"""Plotting layer tests (headless Agg backend)."""

import matplotlib

matplotlib.use('Agg')

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

from iqwaveform_tpu import figures, power_analysis

from conftest import make_tone_noise


@pytest.fixture(autouse=True)
def close_figures():
    yield
    plt.close('all')


def test_gamma_qq_scale_registered():
    fig, ax = plt.subplots()
    ax.plot([0.001, 0.5, 0.999], [0, 1, 2])
    ax.set_xscale('gamma-qq', k=10)
    fig.canvas.draw()
    assert ax.get_xscale() == 'gamma-qq'


def test_gamma_qq_ticks_in_range():
    fig, ax = plt.subplots()
    ax.plot([1e-6, 0.5, 1 - 1e-6], [0, 1, 2])
    ax.set_xscale('gamma-qq', k=4)
    fig.canvas.draw()
    ticks = ax.get_xticks()
    assert len(ticks) > 3
    assert np.all((ticks > 0) & (ticks < 1))


def test_gamma_qq_transform_roundtrip():
    from scipy import stats

    k = 10
    fwd = lambda q: power_analysis.powtodB(stats.gamma.isf(q, a=k, scale=1))  # noqa
    inv = lambda x: stats.gamma.sf(power_analysis.dBtopow(x), a=k, scale=1)  # noqa
    q = np.array([0.01, 0.5, 0.99])
    np.testing.assert_allclose(inv(fwd(q)), q, rtol=1e-9)


def test_pcolormesh_df():
    df = pd.DataFrame(
        np.random.default_rng(0).random((8, 16)),
        index=np.arange(8) * 1.0,
        columns=np.linspace(-1e6, 1e6, 16),
    )
    df.index.name = 'Time (s)'
    df.columns.name = 'Frequency'
    c = figures.pcolormesh_df(df, y_unit='s', x_unit='Hz')
    assert c is not None
    ax = plt.gca()
    assert ax.get_ylabel() == 'Time (s)'


def test_plot_spectrogram_heatmap_from_iq():
    x = make_tone_noise(1024 * 8, fs=1e6)
    window = np.hanning(256)
    ax, spg = figures.plot_spectrogram_heatmap_from_iq(x, window, 1e-6)
    assert spg.shape[1] == 256


def test_plot_spectrogram_heatmap():
    from iqwaveform_tpu import iq_to_stft_spectrogram

    x = make_tone_noise(1024 * 8, fs=1e6)
    spg = iq_to_stft_spectrogram(x, 'hann', 256, 1e-6)
    ax, _ = figures.plot_spectrogram_heatmap(spg, 1e-6)
    assert ax is not None


def test_plot_power_histogram_heatmap():
    rng = np.random.default_rng(0)
    pvt = pd.DataFrame(
        rng.exponential(size=(64, 16)) + 1e-6, index=np.arange(64) * 0.1
    )
    hist = power_analysis.power_histogram_along_axis(
        pvt.T, bounds=(-40, 20), resolution_db=2, resolution_axis=4, axis=0
    )
    ax, c = figures.plot_power_histogram_heatmap(hist)
    assert ax is not None


def test_plot_power_ccdf():
    x = make_tone_noise(20000)
    ax, ccdf, bins = figures.plot_power_ccdf(x, 1e-6, Tavg=1e-4, bins=100)
    assert ccdf.shape == bins.shape
    assert ax.get_xscale() == 'gamma-qq'


def test_contiguous_segments():
    idx = np.concatenate([np.arange(10) * 1.0, 100 + np.arange(10) * 1.0])
    df = pd.DataFrame({'v': np.arange(20)}, index=pd.Index(idx, name='Time'))
    segs = figures.contiguous_segments(df, 'Time')
    assert len(segs) == 2
    assert len(segs[0]) == 10


@pytest.mark.parametrize(
    'style', ['ieee', 'ieee_double_column', 'nist_report']
)
def test_mplstyles_load(style):
    import iqwaveform_tpu
    from pathlib import Path

    path = Path(iqwaveform_tpu.__file__).parent / f'{style}.mplstyle'
    assert path.exists()
    with plt.style.context(str(path)):
        fig, ax = plt.subplots()
        ax.plot([0, 1], [0, 1])
        fig.canvas.draw()
