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
    'counter_fold',
    'counter_value',
    'dtype_change_float',
    'find_float_inds',
    'float_dtype_like',
    'isroundmod',
]

# ---- exact wide integer counters in float32 pairs ----
#
# TPU-side streaming statistics need exact event counts, but (a) jax
# runs with x64 disabled so int64 silently truncates to int32, and
# (b) the axon tunnel only D2H-copies float32. A count is therefore
# carried as two float32 planes, value = hi * 2**23 + lo with
# lo in [0, 2**23): both components hold integers < 2**24, where float32
# is exact, so accumulation is exact up to 2**47 total events
# (an hour at 122.88 MS/s is ~4.4e11).

COUNTER_SCALE = float(1 << 23)


def counter_fold(hi, lo, delta):
    """fold integer-valued ``delta`` (int32 or integer-valued float32
    below 2**24 per element) into the (hi, lo) float32 pair counter."""
    xp = array_namespace(hi)
    delta = delta.astype(hi.dtype) if hasattr(delta, 'astype') else delta
    d_hi = xp.floor(delta / COUNTER_SCALE)
    d_lo = delta - d_hi * COUNTER_SCALE
    lo1 = lo + d_lo
    spill = xp.floor(lo1 / COUNTER_SCALE)
    return hi + d_hi + spill, lo1 - spill * COUNTER_SCALE


def counter_value(hi, lo):
    """read a (hi, lo) pair counter as float32 (exact below 2**24,
    nearest-float32 above)."""
    return hi * COUNTER_SCALE + lo


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
    if np.ndim(div) == 0 and div == 0:
        raise ValueError('isroundmod divisor must be nonzero')
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
