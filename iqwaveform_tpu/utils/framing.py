"""Framing and axis-generic shape transforms.

Feature parity: reference util.py:400-442 (to_blocks), util.py:227-362
(sliding_window_view + cached output-shape calc), util.py:466-494
(axis_index/axis_slice), util.py:217-224 (pad_along_axis), util.py:59-106
(binned_mean), util.py:497-542 (histogram_last_axis), util.py:571-589
(iter_along_axes), util.py:597-640 (grouped views).

TPU-native notes:

* The reference relies on zero-copy numpy stride tricks. XLA has no user
  strides, so ``sliding_window_view`` here is a *gather* — but every consumer
  in this package (STFT framing) instead uses the block-gather fast path in
  ops.stft, where overlapping frames are built from ``hop``-sized contiguous
  blocks with a tiny row-index gather. That is the XLA-friendly equivalent of
  a strided view: the gather indices are (n_frames, R) instead of
  (n_frames, nfft).
* Everything here is pure shape math, safe to call on tracers inside jit.
"""

from __future__ import annotations

import functools
import itertools
import math
import typing
from numbers import Number

import numpy as np

from .caching import lru_cache
from .dispatch import array_namespace

__all__ = [
    'axis_index',
    'axis_slice',
    'binned_mean',
    'histogram_last_axis',
    'iter_along_axes',
    'pad_along_axis',
    'sliding_window_view',
    'to_blocks',
]


def to_blocks(y, size: int, truncate: bool = False, axis: int = 0):
    """reshape ``y`` into blocks of ``size`` along ``axis``
    (reference util.py:400-442).

    Returns an array with shape (..., N[axis]//size, size, ..., N[K-1]).

    Raises:
        TypeError: if size is not an int
        IndexError: if y.size == 0
        ValueError: if truncate is False and y.shape[axis] % size != 0
    """
    if not isinstance(size, (int, np.integer)):
        raise TypeError('block size must be integer')
    if size < 1:
        raise ValueError(f'block size must be a positive integer, not {size}')
    if y.size == 0:
        raise IndexError('cannot form blocks on arrays of size 0')

    pos = axis + y.ndim if axis < 0 else axis
    n_blocks, remainder = divmod(y.shape[pos], size)
    if remainder:
        if not truncate:
            raise ValueError(
                f'axis {pos} size {y.shape[pos]} is not a factor of block size {size}'
            )
        keep = [slice(None)] * y.ndim
        keep[pos] = slice(0, n_blocks * size)
        y = y[tuple(keep)]

    blocked = y.shape[:pos] + (n_blocks, size) + y.shape[pos + 1 :]
    return y.reshape(blocked)


@functools.cache
def _pad_slices_to_dim(ndim: int, axis: int):
    """(reference util.py:445-463)"""
    if not isinstance(axis, int):
        raise TypeError('axis argument must be integer')

    pos = axis + ndim if axis < 0 else axis
    if pos < 0:
        raise ValueError(f'axis {pos} exceeds the number of dimensions')

    # pick the shorter spelling: explicit leading slices for front-half
    # axes, an Ellipsis prefix with trailing slices otherwise
    if pos <= ndim // 2:
        before = (slice(None),) * pos
        after = ()
    else:
        before = (Ellipsis,)
        after = (slice(None),) * (ndim - pos - 1)

    return before, after


def axis_index(a, index, axis: int = -1):
    """index selection on axis `axis` of `a` (reference util.py:466-477)."""
    before, after = _pad_slices_to_dim(a.ndim, axis)
    return a[before + (index,) + after]


def axis_slice(a, start, stop=None, step=None, axis: int = -1):
    """slice on axis `axis` of `a` (reference util.py:480-494)."""
    before, after = _pad_slices_to_dim(a.ndim, axis)
    sl = slice(start, stop, step)
    return a[before + (sl,) + after]


def pad_along_axis(a, pad_width: list, axis: int = 0, *args, **kws):
    """pad only along ``axis`` (``pad_width`` pairs apply to consecutive
    axes starting there; reference util.py:217-224).

    The reference builds only the LEADING [0, 0] pairs, so for axis=0 on
    a multi-dim array np.pad broadcasts the single pair to every axis
    (and its negative-axis arithmetic is off by one); both are latent
    reference bugs (intent is clearly one-axis padding), fixed here by
    completing the trailing pairs — see docs/PARITY.md.
    """
    ax = axis if axis >= 0 else axis + a.ndim
    if not 0 <= ax < a.ndim:
        raise ValueError(f'axis {axis} out of range for ndim {a.ndim}')
    pads = [[0, 0]] * ax + list(pad_width)
    pads += [[0, 0]] * (a.ndim - len(pads))
    if len(pads) != a.ndim:
        raise ValueError(
            f'{len(pad_width)} pad pairs starting at axis {axis} exceed '
            f'ndim {a.ndim}'
        )
    xp = array_namespace(a)
    return xp.pad(a, pads, *args, **kws)


@lru_cache()
def sliding_window_output_shape(
    array_shape: tuple, window_shape, axis
) -> tuple:
    """output shape of sliding_window_view (reference util.py:227-268)."""
    window_shape = (
        tuple(window_shape) if np.iterable(window_shape) else (window_shape,)
    )
    if min(window_shape) < 0:
        raise ValueError('`window_shape` cannot contain negative values')

    ndim = len(array_shape)
    if axis is None:
        if len(window_shape) != ndim:
            raise ValueError(
                f'Since axis is `None`, must provide window_shape for all '
                f'dimensions of `x`; got {len(window_shape)} window_shape '
                f'elements and `x.ndim` is {ndim}.'
            )
        axis = tuple(range(ndim))
    else:
        axis = (int(axis),) if isinstance(axis, Number) else tuple(axis)
        axis = tuple(ax % ndim for ax in axis)
        if len(axis) != len(window_shape):
            raise ValueError(
                f'Must provide matching length window_shape and axis; got '
                f'{len(window_shape)} window_shape elements and {len(axis)} '
                f'axes elements.'
            )

    # each windowed axis loses (span - 1) positions; window spans append
    trimmed = list(array_shape)
    for ax, span in zip(axis, window_shape):
        if array_shape[ax] < span:
            raise ValueError('window shape cannot be larger than input array shape')
        trimmed[ax] += 1 - span
    return tuple(trimmed) + window_shape


def sliding_window_view(x, window_shape, axis=None, *, subok=False, writeable=False):
    """sliding window view (reference util.py:271-362).

    numpy inputs: zero-copy strided view via numpy.
    jax inputs: gather-based equivalent (values identical; XLA fuses the
    gather into downstream consumers). Only single-axis windows are supported
    for jax inputs, which covers every use in this package.
    """
    if writeable:
        raise NotImplementedError('Writeable views are not supported.')

    xp = array_namespace(x)

    window_shape = (
        tuple(window_shape) if np.iterable(window_shape) else (window_shape,)
    )

    if xp is np:
        return np.lib.stride_tricks.sliding_window_view(
            x, window_shape, axis=axis, subok=subok
        )

    # jax path: build via take() on one axis
    if axis is None:
        if x.ndim != 1 or len(window_shape) != 1:
            raise NotImplementedError(
                'jax sliding_window_view supports a single window axis'
            )
        axis = 0
    elif np.iterable(axis):
        (axis,) = tuple(axis)
    axis = int(axis) % x.ndim

    (wsize,) = window_shape
    n_out = x.shape[axis] - wsize + 1
    if n_out < 1:
        raise ValueError('window shape cannot be larger than input array shape')

    starts = np.arange(n_out)[:, None] + np.arange(wsize)[None, :]
    out = xp.take(x, starts.reshape(-1), axis=axis)
    new_shape = x.shape[:axis] + (n_out, wsize) + x.shape[axis + 1 :]
    out = out.reshape(new_shape)
    # reference semantics: window dim appended at the end
    return xp.moveaxis(out, axis + 1, -1)


def binned_mean(x, count, *, axis=0, truncate=True, reject_extrema=False, fft=True):
    """reduce an array by averaging into bins on the specified axis
    (reference util.py:59-106).

    Arguments:
        x: input array
        count: bin count to average
        axis: axis along which to implement the binned mean
        truncate: True to truncate incomplete bins at the edges
        reject_extrema: if True, exclude min/max samples from each bin
        fft: if True, bins align with fft bins (centered, instead of left side)
    """
    xp = array_namespace(x)
    if not isinstance(count, (int, np.integer)) or count < 1:
        raise ValueError(f'bin count must be a positive integer, not {count}')
    if x.size == 0 or x.shape[axis] < count:
        raise ValueError(
            f'binned_mean needs at least count={count} samples along the '
            f'axis, got {x.shape[axis] if x.ndim else 0}'
        )

    if truncate:
        start, stop = _whole_bin_span(x.shape[axis], count, centered=fft)
        if (start, stop) != (0, x.shape[axis]):
            x = axis_slice(x, start, stop, axis=axis)

    frames = to_blocks(x, count, axis=axis)
    stat_axis = axis + 1 if axis >= 0 else axis
    if reject_extrema:
        frames = axis_slice(xp.sort(frames, axis=stat_axis), 1, -1, axis=stat_axis)
    return xp.nanmean(frames, axis=stat_axis)


def _whole_bin_span(size: int, count: int, *, centered: bool) -> tuple:
    """largest whole-bin [start, stop) span of a length-``size`` axis.

    A centered span keeps index size//2 in the middle of a middle bin
    (fft-bin alignment, reference util.py:83-93); a left-aligned span
    drops the tail remainder.
    """
    if not centered:
        return 0, (size // count) * count
    mid = size // 2
    whole_blocks_left = (mid - count // 2) // count
    n_blocks = 2 * whole_blocks_left + 1
    start = mid - (count * n_blocks) // 2
    # the symmetric block count can overrun the right edge when the
    # center bin sits left of the axis midpoint (e.g. size=26, count=3
    # gives stop=27): shrink by whole block pairs, which preserves the
    # center-bin alignment. The reference (util.py:83-93) slices past
    # the end here and fails inside to_blocks; not reproduced
    # (docs/PARITY.md).
    while n_blocks > 1 and start + count * n_blocks > size:
        n_blocks -= 2
        start = mid - (count * n_blocks) // 2
    return start, start + count * n_blocks


def histogram_last_axis(x, bins, range: tuple = None):
    """histogram along the last axis of an input array
    (reference util.py:497-542).

    Args:
        x: input data of shape (M[0], ..., M[K-1], N)
        bins: number of bins, or a vector of bin edges
        range: [lower, upper] bin bounds, inclusive

    Returns:
        (counts with shape (M[0], ..., M[K-1], n_bins), bin edges)

    TPU-native notes: the reference builds per-row unique ids and uses one
    global bincount. Under XLA the same op is a scatter-add into a dense
    (rows, n_edges+1) accumulator, which parallelizes across rows; the jax
    and numpy paths below produce identical counts.
    """
    xp = array_namespace(x)

    hist_size = x.shape[-1]

    if isinstance(bins, (int, np.integer)):
        if range is None:
            range = x.min(), x.max()
        edges = xp.linspace(range[0], range[1], bins + 1)
    else:
        edges = xp.asarray(bins)

    flat = x.reshape(-1, hist_size)
    n_edges = edges.shape[0]
    idx = xp.searchsorted(edges, flat, 'right') - 1

    # off-limits elements
    bad_mask = (idx == -1) | (idx == n_edges)

    if xp is np:
        scaled_idx = n_edges * np.arange(flat.shape[0])[:, None] + idx
        limit = n_edges * flat.shape[0]
        scaled_idx[bad_mask] = limit
        counts = np.bincount(scaled_idx.ravel(), minlength=limit + 1)[:-1]
        counts = counts.reshape(x.shape[:-1] + (n_edges,))
    else:
        idx = xp.where(bad_mask, n_edges, idx)
        row = xp.broadcast_to(
            xp.arange(flat.shape[0])[:, None], flat.shape
        )
        acc = xp.zeros((flat.shape[0], n_edges + 1), dtype=xp.int32)
        acc = acc.at[row.reshape(-1), idx.reshape(-1)].add(1)
        counts = acc[:, :-1].reshape(x.shape[:-1] + (n_edges,))

    return counts[..., :-1], edges


def iter_along_axes(x, axes) -> typing.Iterable[tuple]:
    """iterate index tuples enumerating every position along ``axes``
    while slicing the remaining dimensions whole
    (reference util.py:571-589)."""
    keep_all = slice(None, None)
    if axes is None:
        return (keep_all,)
    if isinstance(axes, Number):
        axes = (axes,)

    # normalize negatives only: out-of-range axes simply match nothing
    # (reference semantics — every dimension then gets the whole slice)
    wanted = {ax if ax >= 0 else ax + x.ndim for ax in axes}
    per_axis = [
        tuple((n,) for n in range(x.shape[dim])) if dim in wanted else (keep_all,)
        for dim in range(x.ndim)
    ]
    return itertools.product(*per_axis)


@lru_cache()
def grouped_slices_along_axis(shape: tuple, max_size: int, axis: int):
    """slices that split `shape` into <= max_size chunks sparing `axis`
    (reference util.py:597-620). In the TPU build this seeds the
    lax.scan chunk sizes for streaming reductions instead of bounding a
    cufft workspace."""
    if axis < 0:
        axis += len(shape)

    # `remaining` is the element count not yet split by earlier axes;
    # split each non-spared axis just enough to bring it under max_size
    remaining = math.prod(shape)
    per_axis = []
    for dim, n in enumerate(shape):
        if dim == axis or remaining < max_size:
            per_axis.append((slice(None, None),))
            continue

        count = min(n, max(1, ceildiv_local(remaining, max_size)))
        step = n // count
        per_axis.append(
            tuple(slice(lo, min(lo + step, n)) for lo in range(0, n, step))
        )
        remaining //= count

    return per_axis


def ceildiv_local(a, b):
    return -(a // -b)


def grouped_views_along_axis(x, max_size: int, axis: int = 0):
    """yield <= max_size-element views of x, chunked on every axis except
    ``axis`` (reference util.py:623-640)."""
    if x.size < max_size:
        yield x
        return

    produced = False
    chunk_grid = grouped_slices_along_axis(x.shape, max_size, axis)
    for index in itertools.product(*chunk_grid):
        produced = True
        yield x[index]

    if not produced:
        yield x
