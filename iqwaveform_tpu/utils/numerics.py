"""Misc host-side numeric helpers.

Feature parity: reference util.py:121-141 (find_float_inds, isroundmod),
util.py:365-397 (float_dtype_like), util.py:545-568 (dtype_change_float),
util.py:592-594 (ceildiv).

All of these run at trace time (rate design, dtype selection); none trace
into XLA programs, which keeps shapes and dtypes static under jit.
"""

from __future__ import annotations

import math
from numbers import Number

import numpy as np

from .caching import lru_cache
from .dispatch import array_namespace, is_jax_array

__all__ = [
    'ceildiv',
    'dtype_change_float',
    'find_float_inds',
    'float_dtype_like',
    'isroundmod',
]


def ceildiv(a: int, b: int) -> int:
    """Returns ceil(a/b) (reference util.py:592-594)."""
    return -(-a // b)


@lru_cache()
def find_float_inds(seq: tuple) -> list[bool]:
    """flag whether each element can be converted to float (reference util.py:121-133)."""
    ret = []
    for s in seq:
        try:
            float(s)
        except (ValueError, TypeError):
            ret.append(False)
        else:
            ret.append(True)
    return ret


def isroundmod(value, div, atol=1e-6) -> bool:
    """tolerant divisibility test used by every rate-design function
    (reference util.py:136-141). Accepts scalars or arrays."""
    ratio = value / div
    try:
        return abs(math.remainder(ratio, 1)) <= atol
    except TypeError:
        return np.abs(np.rint(ratio) - ratio) <= atol


def float_dtype_like(x, min_dtype=None) -> np.dtype:
    """floating-point dtype corresponding to x (reference util.py:365-397).

    complex64 -> float32, complex128 -> float64; floats map to themselves;
    non-float dtypes map to float32.
    """
    if isinstance(x, Number):
        dtype_in = np.asarray(x).dtype
    elif is_jax_array(x):
        dtype_in = np.dtype(x.dtype)
    else:
        dtype_in = np.asarray(x).dtype

    try:
        dtype = np.finfo(dtype_in).dtype
    except ValueError:
        dtype = np.dtype('float32')

    if min_dtype is not None:
        min_dtype = np.dtype(min_dtype)
        if min_dtype.itemsize > dtype.itemsize:
            dtype = min_dtype

    return dtype


@lru_cache()
def dtype_change_float(dtype, float_basis_dtype) -> np.dtype:
    """return a complex or float dtype similar to `dtype`, but with float
    backing matching `float_basis_dtype` (reference util.py:545-568).

    Examples:
        dtype_change_float(np.complex128, np.float32) -> complex64
        dtype_change_float(np.float64, np.float32) -> float32
    """
    np_input_type = np.dtype(dtype).type
    np_float_type = np.finfo(np.dtype(float_basis_dtype)).dtype.type

    if np_input_type in (np.complex128, np.complex64):
        if np_float_type is np.float32:
            return np.dtype(np.complex64)
        elif np_float_type is np.float64:
            return np.dtype(np.complex128)
    elif np_input_type in (np.float16, np.float32, np.float64):
        return np.dtype(np_float_type)

    raise ValueError(
        f'unable to identify output dtype similar to {dtype} '
        f'matching floating point {float_basis_dtype}'
    )


def isclosetoint(v, atol=1e-6) -> bool:
    """True if v (scalar or array) is within atol of an integer
    (reference ofdm.py:643-645)."""
    xp = array_namespace(v) if not isinstance(v, Number) else np
    close = xp.isclose(v % 1, 0, atol=atol) | xp.isclose(v % 1, 1, atol=atol)
    return bool(np.any(close))
