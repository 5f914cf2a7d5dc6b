"""Array-backend dispatch between numpy (host) and jax.numpy (device).

Feature parity: reference util.py:198-214 (array_namespace over
numpy/cupy/mlx via array_api_compat).

The TPU-native design has exactly two namespaces:

* ``numpy`` — host-side design math (windows, index tables, axes arrays).
* ``jax.numpy`` — everything that touches waveform data. jax arrays *and*
  tracers (inside ``jax.jit``) both dispatch here, so every public function
  in this package can be called eagerly or from inside user jit code.
"""

from __future__ import annotations

from numbers import Number

import jax
import jax.numpy as jnp
import numpy as np


def is_jax_array(x) -> bool:
    """True for concrete jax arrays and for tracers (inside jit/vmap/grad)."""
    return isinstance(x, (jax.Array, jax.core.Tracer))


def is_traced(x) -> bool:
    """True only for tracers (the caller is inside jit/vmap/grad).

    Host-orchestrated multi-pass algorithms (the exact-quantile
    refinement's bracket planning reads device results between passes)
    cannot run under trace; they use this to pick a traceable
    equivalent or raise a clear error instead of a deep
    TracerArrayConversionError."""
    return isinstance(x, jax.core.Tracer)


def is_numpy_array(x) -> bool:
    return isinstance(x, np.ndarray)


def is_cupy_array(x) -> bool:
    """compat shim for code ported from the reference (util.py:12):
    cupy's accelerator role is taken by jax here, so this is always
    False — use :func:`is_jax_array` for the device-array test."""
    return False


def array_namespace(a, use_compat: bool = False):
    """return the array module (numpy or jax.numpy) for ``a``.

    Mirrors reference util.py:198-214, with jax.numpy taking the role of the
    accelerator namespace. Raises TypeError for unrecognized objects
    (including pandas objects, matching the reference behavior that lets
    callers fall back to ``.values`` handling).
    """
    del use_compat  # accepted for API compatibility

    if is_jax_array(a):
        return jnp
    if isinstance(a, (np.ndarray, np.generic)):
        return np
    raise TypeError(f'unrecognized object type {type(a)!r}')


def array_namespace_or_numpy(a):
    """like array_namespace, but scalars and unknown array-likes map to numpy."""
    try:
        return array_namespace(a)
    except TypeError:
        if isinstance(a, Number) or hasattr(a, '__len__'):
            return np
        raise


def to_device_array(x, dtype=None):
    """convert array-like input (numpy/pandas/list/jax) to a jax array."""
    if hasattr(x, 'values') and not isinstance(x, (np.ndarray, jax.Array)):
        x = x.values
    return jnp.asarray(x, dtype=dtype)


def to_host_array(x):
    """convert to a numpy array, forcing device transfer if needed."""
    if is_jax_array(x):
        return np.asarray(x)
    return np.asarray(x)


def pack_iq_f32(x) -> np.ndarray:
    """pack complex IQ as a (2, ...) float32 array of (real, imag) planes.

    Workaround for transports that only move float32 across the host<->
    device boundary (the axon TPU tunnel rejects complex64 transfers):
    ship the planes, then rebuild complex on device with `unpack_iq`
    inside jit.
    """
    x = np.asarray(x)
    return np.stack([x.real, x.imag]).astype('float32')


def unpack_iq(ri):
    """rebuild complex IQ from (2, ...) float32 planes (traceable)."""
    import jax

    return jax.lax.complex(ri[0], ri[1])
