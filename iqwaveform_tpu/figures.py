"""Plotting layer: spectrogram/histogram heatmaps, CCDF plots, and the
gamma-QQ probability scale.

Feature parity: reference figures.py (855 LoC): GammaQQScale custom mpl
scale with GammaMaxNLocator tick pruning and GammaLogitFormatter
(figures.py:98-281), pcolormesh_df heatmaps with EngFormatter and
label-collision rotation (:399-458), spectrogram heatmaps (:461-583),
power-histogram heatmap with log color norm and extended colorbar
(:586-807), plot_power_ccdf (:810-855), contiguous_segments (:284-295),
and the xarray unit-label patch (:21-31).

Everything here is host-side matplotlib; device arrays are pulled to host
at the plotting boundary.
"""

from __future__ import annotations

import math
import typing

import numpy as np

from .power_analysis import dBtopow, envtodB, iq_to_bin_power, powtodB, sample_ccdf
from .fourier import iq_to_stft_spectrogram
from .utils import lazy_import, lru_cache, optional_import

if typing.TYPE_CHECKING:
    import matplotlib as mpl
    import pandas as pd
    from scipy import stats
else:
    mpl = lazy_import('matplotlib')
    stats = lazy_import('scipy.stats')
    pd = lazy_import('pandas')


def _show_xarray_units_in_parentheses():
    """change xarray plots to "Label ({units})" per IEEE style
    (reference figures.py:21-31). No-op when xarray is not installed."""
    xr = optional_import('xarray')
    if xr is None:
        return
    try:
        from xarray.plot.utils import _get_units_from_attrs
    except ImportError:
        return

    code = _get_units_from_attrs.__code__
    consts = tuple(' ({})' if c == ' [{}]' else c for c in code.co_consts)
    _get_units_from_attrs.__code__ = code.replace(co_consts=consts)


_show_xarray_units_in_parentheses()


def round_places(x, digits):
    """(reference figures.py:34-36)"""
    scale = 10 ** (np.ceil(np.log10(x)))
    return np.round(x / scale, digits) * scale


def is_decade(x, **kwargs):
    """(reference figures.py:39-41)"""
    y = np.log10(x)
    return np.isclose(y, np.round(y), **kwargs)


@lru_cache()
def _log_tick_range(vlo, vhi, count, subs=(1.0,)):
    """LogLocator-generated ticks confined to [vlo, vhi)
    (reference figures.py:44-53)."""
    locator = mpl.ticker.LogLocator(base=10.0, subs=subs, numticks=count)
    ticks = locator.tick_values(vlo, vhi)
    return ticks[(ticks >= vlo) & (ticks < vhi)]


@lru_cache()
def _linear_tick_range(vlo, vhi, count, steps=(1.0,)):
    """MaxNLocator-generated ticks confined to [vlo, vhi)
    (reference figures.py:56-65)."""
    locator = mpl.ticker.MaxNLocator(nbins=count, steps=steps)
    ticks = locator.tick_values(vlo, vhi)
    return ticks[(ticks >= vlo) & (ticks < vhi)]


@lru_cache()
def _prune_ticks(ticks: tuple, count: int, prefer: tuple = tuple()) -> np.ndarray:
    """prune ticks to `count`, spreading them evenly while preserving the
    `prefer` list when possible (reference figures.py:68-95)."""
    ticks = np.array(ticks).copy()
    prefer = np.array(prefer)
    while count < len(ticks):
        diffs = np.nanmin(
            np.vstack([np.diff(ticks, prepend=np.nan), np.diff(ticks, append=np.nan)]),
            axis=0,
        )

        for i in np.argsort(diffs):
            if ticks[i] not in prefer[: min(len(prefer), count)]:
                ticks = np.delete(ticks, i)
                break
        else:
            break

    return ticks


# the locator/formatter/scale classes subclass lazily-imported matplotlib
# classes, so they are built (and the scale registered) at module import
def _build_mpl_classes():
    import matplotlib as mpl_mod

    global GammaMaxNLocator, GammaLogitFormatter, GammaQQScale
    if GammaMaxNLocator is not None:
        return

    class _GammaMaxNLocator(mpl_mod.ticker.MaxNLocator):
        """tick locator for linearized gamma-distributed survival functions
        (reference figures.py:98-185)."""

        # quantiles to avoid removing when selecting ticks
        PREFER_TICKS = [
            0.5,
            0.9,
            0.1,
            0.99,
            1 - 1e-3,
            1 - 1e-4,
            0.95,
            1e-4,
            0.8,
            1 - 1e-5,
            0.98,
            1e-2,
            1 - 1e-6,
            1e-5,
            1e-3,
            1 - 1e-7,
            1 - 1e-8,
            1 - 1e-9,
            1e-7,
            1e-9,
            1e-8,
        ]

        def __init__(self, transform, nbins=None, minor=False):
            self._transform = transform
            self._minor = minor
            super().__init__(nbins)

        def __call__(self):
            dmin, dmax = self.axis.get_data_interval()
            vmin, vmax = self.axis.get_view_interval()
            return self.tick_values(max(vmin, dmin), min(vmax, dmax))

        def tick_values(self, vmin, vmax):
            vmin, vmax = min((vmin, vmax)), max((vmin, vmax))
            vmin, vmax = self.limit_range_for_scale(vmin, vmax, 1e-9)

            # probability regimes: log-spaced tails, linear center
            vth_lo = 0.15
            vth_hi = 0.85

            maybe_ticks = []
            maybe_ticks.extend(_log_tick_range(vmin, vth_lo, self._nbins, subs=(1.0,)))
            maybe_ticks.extend(
                _linear_tick_range(vth_lo, vth_hi, self._nbins, steps=(1, 5, 10))
            )
            maybe_ticks.extend(
                1
                - _log_tick_range(1 - vmax, 1 - vth_hi, self._nbins, subs=(1.0, 2, 3, 5))
            )
            maybe_ticks.extend([0.9, 0.95])
            maybe_ticks = np.sort(np.unique(maybe_ticks))

            # select in the transformed (linearized) space
            tr_ticks = self._transform.transform(maybe_ticks)
            tr_prefer = self._transform.transform(
                np.array(self.PREFER_TICKS + [vmin] + [vmax])
            )
            tr_ticks = _prune_ticks(tuple(tr_ticks), self._nbins, tuple(tr_prefer))
            ticks = self._transform.inverted().transform(tr_ticks)
            return np.sort(ticks)

        def get_transform(self):
            return self._transform

        def limit_range_for_scale(self, vmin, vmax, minpos):
            """limit the domain to (0, 1)."""
            vmin, vmax = min((vmin, vmax)), max((vmin, vmax))

            if not np.isfinite(minpos):
                minpos = 1e-12

            ret = (
                minpos if vmin <= minpos else vmin,
                1.0 - minpos if vmax >= 1 - minpos else vmax,
            )

            self.axis.set_view_interval(ret[1], ret[0], True)
            return ret

        def view_limits(self, vmin, vmax):
            return self.nonsingular(vmin, vmax)

    class _GammaLogitFormatter(mpl_mod.ticker.LogitFormatter):
        """probability tick labels on the gamma-QQ scale
        (reference figures.py:188-215)."""

        def __call__(self, x, pos=None):
            if self._minor and x not in self._labelled:
                return ''
            if x <= 0 or x >= 1:
                return ''
            if math.isclose(2 * x, round(2 * x)) and round(2 * x) == 1:
                s = self._one_half
            elif np.any(np.isclose(x, np.array([0.9, 0.99]), rtol=1e-5)):
                if x < 0.15:
                    s = f'{round_places(x, 1):f}'
                else:
                    s = str(x)
            elif x < 0.1 and is_decade(x, rtol=1e-5):
                exponent = round(np.log10(x))
                s = '10^{%d}' % exponent
            elif x > 0.9 and is_decade(1 - x, rtol=1e-5):
                exponent = round(np.log10(1 - x))
                s = self._one_minus('10^{%d}' % exponent)
            elif x < 0.05:
                s = self._format_value(x, self.locs)
            elif x > 0.98:
                s = self._one_minus(self._format_value(1 - x, 1 - self.locs))
            else:
                s = self._format_value(x, self.locs, sci_notation=False)
            return r'$\mathdefault{%s}$' % s

    class _GammaQQScale(mpl_mod.scale.FuncScale):
        """transformed scale that linearizes gamma-distributed survival
        functions when the independent axis is log-scaled (e.g. dB)
        (reference figures.py:218-278).

        Usage:

            plot(10*np.log10(bins), sf)
            ax.set_xscale('gamma-qq', k=10)

        For power measurements, the shape parameter ``k`` equals the number
        of averaged power samples.
        """

        name = 'gamma-qq'

        def __init__(
            self,
            axis,
            *,
            k,
            major_ticks=10,
            minor_ticks=None,
            vmin=None,
            vmax=None,
            db_ordinal=True,
        ):
            def forward(q):
                x = stats.gamma.isf(q, a=k, scale=1)
                if db_ordinal:
                    x = powtodB(x)
                return x

            def inverse(x):
                if db_ordinal:
                    x = dBtopow(x)
                return stats.gamma.sf(x, a=k, scale=1)

            transform = mpl_mod.scale.FuncTransform(forward=forward, inverse=inverse)
            self._major_locator = _GammaMaxNLocator(
                transform=transform, nbins=major_ticks
            )

            super().__init__(axis, (forward, inverse))

        def set_default_locators_and_formatters(self, axis):
            axis.set_major_locator(self._major_locator)
            axis.set_major_formatter(_GammaLogitFormatter(one_half='0.5'))

    GammaMaxNLocator = _GammaMaxNLocator
    GammaLogitFormatter = _GammaLogitFormatter
    GammaQQScale = _GammaQQScale

    mpl_mod.scale.register_scale(_GammaQQScale)


GammaMaxNLocator = None
GammaLogitFormatter = None
GammaQQScale = None
_build_mpl_classes()


def contiguous_segments(df, index_level, threshold=7, relative=True):
    """split `df` where index values (level `index_level`) jump by more
    than threshold x (median step) (reference figures.py:284-295)."""
    delta = pd.Series(df.index.get_level_values(index_level)).diff()
    if relative:
        threshold = threshold * delta.median()
    i_gaps = delta[delta > threshold].index.values
    i_segments = [[0] + list(i_gaps), list(i_gaps) + [None]]

    return [df.iloc[i0:i1] for i0, i1 in zip(*i_segments)]


def _has_tick_label_collision(ax, which: str, spacing_threshold=10):
    """check whether tick labels overlap along an axis
    (reference figures.py:298-329)."""
    fig = ax.get_figure()

    if which == 'x':
        the_ax = ax.xaxis
    elif which == 'y':
        the_ax = ax.yaxis
    else:
        raise ValueError(f'"which" must be "x" or "y", but got "{repr(which)}"')

    boxen = [
        t.get_tightbbox(fig.canvas.get_renderer()) for t in the_ax.get_ticklabels()
    ]

    if which == 'x':
        boxen = np.array([(b.x0, b.x1) for b in boxen])
    else:
        boxen = np.array([(b.y0, b.y1) for b in boxen])

    spacing = boxen[1:, 0] - boxen[:-1, 1]

    return np.min(spacing) < spacing_threshold


def rotate_ticklabels_on_collision(ax, which: str, angles: list, spacing_threshold=3):
    """(reference figures.py:332-366)"""
    from matplotlib import pyplot as plt

    def set_rotation(the_ax, angle):
        for label in the_ax.get_ticklabels():
            label.set_rotation(angle)
            if which == 'y' and angle == 90:
                label.set_verticalalignment('center')
            elif which == 'x' and angle == 90:
                label.set_horizontalalignment('right')

    if which == 'x':
        the_ax = ax.xaxis
    elif which == 'y':
        the_ax = ax.yaxis
    else:
        raise ValueError(f'"which" argument must be "x" or "y", but got "{repr(which)}"')

    set_rotation(the_ax, angles[0])
    if len(angles) == 1:
        return angles[0]

    a = angles[0]
    for angle in angles[1:]:
        plt.draw()

        if _has_tick_label_collision(ax, which, spacing_threshold):
            a = angle
            set_rotation(the_ax, angle)
        else:
            break
    return a


def xaxis_concise_dates(fig, ax, adjacent_offset: bool = True):
    """concise date labels on an x-axis (reference figures.py:369-396)."""
    from matplotlib import pyplot as plt

    formatter = mpl.dates.ConciseDateFormatter(
        mpl.dates.AutoDateLocator(), show_offset=True
    )

    if adjacent_offset:
        plt.xticks(rotation=0, ha='right')
    ax.xaxis.set_major_formatter(formatter)

    plt.draw()

    if adjacent_offset:
        labels = [item.get_text() for item in ax.get_xticklabels()]
        labels[0] = f'{formatter.get_offset()} {labels[0]}'
        ax.set_xticklabels(labels)

        dx = 5 / 72.0
        dy = 0.0
        offset = mpl.transforms.ScaledTranslation(dx, dy, fig.dpi_scale_trans)
        for label in ax.get_xticklabels():
            label.set_transform(label.get_transform() + offset)

    return ax


def pcolormesh_df(
    df,
    vmin=None,
    vmax=None,
    rasterized=True,
    cmap=None,
    ax=None,
    xlabel=None,
    ylabel=None,
    title=None,
    norm=None,
    x_unit=None,
    x_places=None,
    y_unit=None,
    y_places=None,
):
    """pcolormesh heatmap of a DataFrame with engineering-unit axis labels
    (reference figures.py:399-458)."""
    from matplotlib import pyplot as plt

    if ax is None:
        fig, ax = plt.subplots()

    X = df.columns.values
    Y = df.index.values

    drawing = ax.pcolormesh(
        X,
        Y,
        df.values,
        vmin=vmin,
        vmax=vmax,
        rasterized=rasterized,
        cmap=cmap,
        norm=norm,
        edgecolors='none',
    )

    if xlabel is not False:
        ax.set_xlabel(df.columns.name if xlabel is None else xlabel)

    if ylabel is not False:
        ax.set_ylabel(df.index.name if ylabel is None else ylabel)

    if title is not None:
        ax.set_title(title)

    if x_unit is not None:
        ax.xaxis.set_major_formatter(
            mpl.ticker.EngFormatter(unit=x_unit, useMathText=True, places=x_places)
        )
        rotate_ticklabels_on_collision(ax, 'x', [0, 25])

    if y_unit is not None:
        ax.yaxis.set_major_formatter(
            mpl.ticker.EngFormatter(unit=y_unit, useMathText=True, places=y_places)
        )
        rotate_ticklabels_on_collision(ax, 'y', [90, 65, 0])

    return drawing


def _freq_res_label(freq_res: float) -> str:
    if freq_res < 1e3:
        return f'{freq_res:0.1f}'
    elif freq_res < 1e6:
        return f'{freq_res / 1e3:0.1f} kHz'
    elif freq_res < 1e9:
        return f'{freq_res / 1e6:0.1f} MHz'
    return f'{freq_res / 1e9:0.1f} GHz'


def _get_cmap(name):
    return mpl.pyplot.get_cmap(name)


def _draw_spectrogram(spg, Ts, *, ax, vmin, vmax, cmap, transpose,
                      colorbar, rasterized):
    """shared renderer behind the two public spectrogram heatmap entry
    points (reference figures.py:461-583)."""
    from matplotlib import pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    if cmap is None:
        cmap = _get_cmap('magma')

    axis_kws = dict(
        xlabel='Time elapsed (s)',
        ylabel='Baseband Frequency',
        y_unit='Hz',
    )
    data = spg.T
    if transpose:
        axis_kws = dict(
            ylabel='Time elapsed (s)',
            xlabel='Baseband Frequency',
            x_unit='Hz',
        )
        data = spg

    c = pcolormesh_df(
        powtodB(data),
        ax=ax,
        cmap=cmap,
        vmin=vmin,
        vmax=vmax,
        rasterized=rasterized,
        **axis_kws,
    )

    if colorbar:
        freq_res = 1 / Ts / spg.shape[1]
        plt.colorbar(
            c, ax=ax, label=f'Bin power (dBm/{_freq_res_label(freq_res)})'
        )

    return ax


def plot_spectrogram_heatmap_from_iq(
    iq,
    window,
    Ts: float,
    ax=None,
    vmin: float = None,
    cmap=None,
    time_span=(None, None),
):
    """spectrogram heatmap computed from an IQ waveform
    (reference figures.py:461-515). Creates axes when ax is None and
    returns them (the reference returns the None it was given)."""
    lo, hi = (
        None if bound is None else int(np.rint(bound / Ts)) for bound in time_span
    )
    iq = iq[lo:hi]

    window = np.asarray(window)
    spg = iq_to_stft_spectrogram(
        iq, window=window, nfft=window.size, Ts=Ts, overlap=True
    )

    ax = _draw_spectrogram(
        spg, Ts, ax=ax, vmin=vmin, vmax=None, cmap=cmap, transpose=False,
        colorbar=True, rasterized=True,
    )
    return ax, spg


def plot_spectrogram_heatmap(
    spg,
    Ts: float,
    ax=None,
    vmin: float = None,
    vmax: float = None,
    cmap=None,
    time_span=(None, None),
    transpose=False,
    colorbar=True,
    rasterized=True,
):
    """heatmap of a precomputed spectrogram DataFrame
    (reference figures.py:518-583). Creates axes when ax is None and
    returns them (the reference returns the None it was given)."""
    ax = _draw_spectrogram(
        spg, Ts, ax=ax, vmin=vmin, vmax=vmax, cmap=cmap, transpose=transpose,
        colorbar=colorbar, rasterized=rasterized,
    )
    return ax, spg


def plot_power_histogram_heatmap(
    rolling_histogram,
    contiguous_threshold=None,
    log_counts=True,
    title: str = None,
    ylabel: str = None,
    xlabel: str = None,
    clabel: str = 'Count',
    xlim: tuple = None,
    ax=None,
    cbar=True,
    rasterized=True,
    x_unit=None,
    x_places=None,
):
    """heat map of power histograms along the time axis, colored by count
    (reference figures.py:586-807).

    Args:
        rolling_histogram: time-indexed histogram DataFrame
            (e.g. from power_analysis.power_histogram_along_axis)
        contiguous_threshold: split at index gaps to avoid drawing across
            missing data
    """
    from matplotlib import pyplot as plt

    if xlim is not None:
        rolling_histogram = rolling_histogram.loc[:, float(xlim[0]) : float(xlim[1])]

    if ax is None:
        fig, ax = plt.subplots()
    else:
        fig = ax.get_figure()

    if rolling_histogram.shape[0] == 0:
        raise EOFError

    index_type = type(rolling_histogram.index[0])

    # quantize the color map levels to the number of bins
    bad_color = '0.95'
    cmap = _get_cmap('magma')
    if hasattr(cmap, 'colors') and rolling_histogram.shape[1] < cmap.N:
        subset = np.linspace(
            0, len(cmap.colors) - 1, rolling_histogram.shape[1], dtype=int
        )
        newcolors = np.array(cmap.colors)[subset].tolist()
        cmap = mpl.colors.ListedColormap(newcolors)
        cmap.set_bad(bad_color)

    if log_counts:
        if np.issubdtype(rolling_histogram.values.dtype, np.integer):
            plot_norm = mpl.colors.LogNorm(vmin=1, vmax=rolling_histogram.max().max())
        else:
            plot_norm = mpl.colors.LogNorm(
                vmin=rolling_histogram[rolling_histogram > 0].min().min(),
                vmax=rolling_histogram.max().max(),
            )
    else:
        plot_norm = None

    pc_kws = dict(
        cmap=cmap,
        norm=plot_norm,
        rasterized=rasterized,
        xlabel=xlabel,
        ylabel=ylabel,
        title=title,
        ax=ax,
        x_unit=x_unit,
        x_places=x_places,
    )

    if issubclass(index_type, pd.Timestamp):
        # split into contiguous segments so gaps are not painted over
        if contiguous_threshold is not None:
            segments = contiguous_segments(
                rolling_histogram, 'Time', threshold=contiguous_threshold
            )
        else:
            segments = [rolling_histogram]

        for hist_sub in segments:
            c = pcolormesh_df(hist_sub.T, **pc_kws)

    elif issubclass(index_type, pd.Timedelta):
        if rolling_histogram.index[1] - rolling_histogram.index[0] < pd.Timedelta(
            seconds=3600
        ):
            t = rolling_histogram.index.total_seconds() / 3600
        else:
            t = rolling_histogram.index.total_seconds()

        hist_sub = pd.DataFrame(
            rolling_histogram.values, index=t, columns=rolling_histogram.columns
        )
        c = pcolormesh_df(hist_sub.T, **pc_kws)
    else:
        c = pcolormesh_df(rolling_histogram.T, **pc_kws)

    if cbar:
        cb = fig.colorbar(c, ax=ax, extend='min', extendrect=True)
        if log_counts:
            formatter = mpl.ticker.LogFormatterSciNotation(
                minor_thresholds=(1, 2, 5), labelOnlyBase=False
            )
            cb.ax.yaxis.set_major_formatter(formatter)
            cb.ax.yaxis.set_minor_formatter(formatter)
        else:
            formatter = mpl.ticker.ScalarFormatter(useMathText=True)
            cb.ax.yaxis.set_major_formatter(formatter)
            cb.ax.ticklabel_format(style='sci', scilimits=(6, 6))
            cb.ax.yaxis.get_offset_text().set_position((0, 1.01))
            cb.ax.yaxis.get_offset_text().set_horizontalalignment('left')
            cb.ax.yaxis.get_offset_text().set_verticalalignment('bottom')

        cb.set_label(clabel, labelpad=-16, y=-0.08, rotation=0, va='top', ha='right')
    else:
        cb = None

    # x-axis date handling
    if issubclass(index_type, pd.Timestamp):
        xaxis_concise_dates(plt.gcf(), ax)
    else:
        plt.draw()

    return ax, c


def plot_power_ccdf(
    iq,
    Ts,
    Tavg=None,
    random_offsets=False,
    bins=None,
    scale='gamma-qq',
    major_ticks=12,
    ax=None,
    label=None,
):
    """empirical power CCDF plot on the gamma-QQ scale
    (reference figures.py:810-855)."""
    from matplotlib import pyplot as plt

    if ax is None:
        fig, ax = plt.subplots()

    if Tavg is None:
        Navg = 1
        power_dB = envtodB(np.asarray(iq))
    else:
        Navg = int(Tavg / Ts)
        power_dB = powtodB(
            np.asarray(
                iq_to_bin_power(
                    iq, Ts=Ts, Tbin=Tavg, randomize=random_offsets, truncate=True
                )
            )
        )

    if bins is None:
        bins = np.arange(power_dB.min(), power_dB.max() + 0.01, 0.01)
    elif np.isscalar(bins):
        bins = np.linspace(power_dB.min(), power_dB.max(), bins)
    else:
        bins = np.array(bins)

    ccdf = np.asarray(sample_ccdf(power_dB, bins))
    ax.plot(ccdf, bins, label=label)

    if scale == 'gamma-qq':
        ax.set_xscale(scale, k=Navg, major_ticks=major_ticks, db_ordinal=True)
    else:
        ax.set_xscale(scale)

    ax.legend()

    return ax, ccdf, bins
