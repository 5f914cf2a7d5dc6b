"""Type aliases for annotations (reference type_stubs.py:1-36).

ArrayType covers the two array backends of this build: numpy (host design
math) and jax.Array (device data).
"""

from __future__ import annotations

import typing

import jax
import numpy as np

try:  # pragma: no cover - stdlib from 3.10
    from typing import TypeAlias  # noqa: F401
except ImportError:  # pragma: no cover
    TypeAlias = typing.Any

ArrayType = typing.Union[np.ndarray, jax.Array]

if typing.TYPE_CHECKING:
    import matplotlib as mpl
    import pandas as pd
    from matplotlib import axes

    SeriesType = pd.Series
    DataFrameType = pd.DataFrame
    IndexType = pd.Index
    ArrayLike = typing.Union[ArrayType, pd.Series, pd.DataFrame]
    AxisType = axes.Axes
    LocatorType = mpl.ticker.MaxNLocator
else:
    SeriesType = typing.Any
    DataFrameType = typing.Any
    IndexType = typing.Any
    ArrayLike = typing.Union[ArrayType, typing.Any]
    AxisType = typing.Any
    LocatorType = typing.Any

# xarray is optional in this image; the aliases exist for reference
# parity (reference type_stubs.py:27-29) and resolve to Any without it
DataArrayType = typing.Any
DatasetType = typing.Any
