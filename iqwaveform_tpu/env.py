"""Notebook plotting environment.

Feature parity: reference env.py:1-133 — SVG/PNG title+caption metadata
injection for notebook exports, concise date axes, set_caption helper.
Import this module in a notebook to configure the environment.
"""

import datetime
import functools

import numpy as np

import matplotlib as mpl
import matplotlib.pyplot as plt

import IPython
import IPython.display
from IPython.display import display, HTML

_captions = {}

from matplotlib.backends import backend_svg  # noqa: E402


def _guess_title(fig):
    """figure suptitle, else the last axes title, else 'untitled'
    (reference env.py:24-34)."""
    if fig._suptitle is not None:
        return fig._suptitle.get_text()

    for ax in fig.get_axes()[::-1]:
        title_ = ax.get_title()
        if title_:
            return title_
    return 'untitled'


def _title_to_label(title_):
    """replace runs of non-alphanumeric characters with '-'."""
    import re

    return re.compile(r'[\W_]+').sub('-', title_).lower()


@functools.wraps(backend_svg.FigureCanvasSVG.print_svg)
def print_svg(self, *a, **k):
    """inject 'Title' metadata (label##caption) into SVG exports
    (reference env.py:20-48)."""
    k = dict(k)
    label = _title_to_label(_guess_title(self.figure))
    caption_text = _captions.get(id(self.figure), '')
    title_ = f'{label}##{caption_text}' if caption_text else label
    k.setdefault('metadata', {})['Title'] = title_

    return backend_svg.FigureCanvasSVG._print_svg(self, *a, **k)


backend_svg.FigureCanvasSVG.print_svg, backend_svg.FigureCanvasSVG._print_svg = (
    print_svg,
    backend_svg.FigureCanvasSVG.print_svg,
)


def set_matplotlib_formats(formats, *args, **kws):
    """set notebook figure formats, wrapping IPython's print_figure to
    display the label+caption under each figure (reference env.py:57-103)."""
    try:
        import matplotlib_inline.backend_inline as _inline

        _inline.set_matplotlib_formats(formats, *args, **kws)
    except ImportError:
        IPython.display.set_matplotlib_formats(formats, *args, **kws)

    from importlib import reload

    from IPython.core import pylabtools

    pylabtools = reload(pylabtools)

    @functools.wraps(pylabtools.print_figure)
    def wrapper(fig, fmt='png', *a, **k):
        k = dict(k)
        label = _title_to_label(_guess_title(fig))
        caption_text = _captions.get(id(fig), '')

        ret = pylabtools._print_figure(fig, fmt=fmt, *a, **k)

        markup = (
            f'<tt>{label}.{fmt}:</tt>'
            f'{"<br>" + caption_text if caption_text else " (no caption data)"}'
        )
        display(HTML(markup))

        return ret

    pylabtools.print_figure, pylabtools._print_figure = (
        wrapper,
        pylabtools.print_figure,
    )


def set_caption(*args):
    """set the caption for a figure in a jupyter notebook.

    Usage: set_caption(fig, text), or set_caption(text) for the current
    figure (reference env.py:110-124).
    """
    if len(args) == 1:
        fig, text = plt.gcf(), args[0]
    elif len(args) == 2:
        fig, text = args
    else:
        raise ValueError(f'expected 1 or 2 args, but got {len(args)}')

    _captions[id(fig)] = text


# concise date formatting by default (reference env.py:106-131)
convert_datetime = mpl.units.registry.get(np.datetime64)

converter = mpl.dates.ConciseDateConverter()
mpl.units.registry[np.datetime64] = converter
mpl.units.registry[datetime.date] = converter
mpl.units.registry[datetime.datetime] = converter

try:
    set_matplotlib_formats('svg')
except Exception:
    # outside a notebook kernel there is nothing to configure
    pass
