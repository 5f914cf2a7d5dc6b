"""Type aliases for annotations (reference type_stubs.py:1-36).

ArrayType covers the two array backends of this build: numpy (host design
math) and jax.Array (device data).
"""

from __future__ import annotations

import typing

import jax
import numpy as np

ArrayType = typing.Union[np.ndarray, jax.Array]

if typing.TYPE_CHECKING:
    import pandas as pd

    SeriesType = pd.Series
    DataFrameType = pd.DataFrame
    IndexType = pd.Index
    ArrayLike = typing.Union[ArrayType, pd.Series, pd.DataFrame]
else:
    SeriesType = typing.Any
    DataFrameType = typing.Any
    IndexType = typing.Any
    ArrayLike = typing.Union[ArrayType, typing.Any]
