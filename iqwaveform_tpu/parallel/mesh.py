"""Device mesh helpers for sharded DSP pipelines.

The reference has zero multi-device code (SURVEY.md §2, parallelism
inventory); this subpackage is the TPU-native scale-out design: long
captures are sharded along the time axis across ICI, STFT/OLA windows
exchange noverlap-sized halos with ppermute, and statistics merge with
psum/pmax — the multi-chip analogue of the reference's bounded-memory
chunk iteration (util.py:597-640, fourier.py:188-197).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

TIME_AXIS = 'iq_time'

__all__ = ['TIME_AXIS', 'Mesh', 'NamedSharding', 'PartitionSpec', 'time_mesh', 'shard_time_axis']


def time_mesh(n_devices: int | None = None, axis_name: str = TIME_AXIS) -> Mesh:
    """1-D device mesh over the capture time axis.

    Args:
        n_devices: number of devices (default: all available)
        axis_name: mesh axis name
    """
    if n_devices is None:
        n_devices = len(jax.devices())
    # Auto axis type: sharding propagates through jit without requiring a
    # jax.set_mesh context (jax >= 0.7 defaults to Explicit)
    return jax.make_mesh(
        (n_devices,), (axis_name,), axis_types=(jax.sharding.AxisType.Auto,)
    )


def shard_time_axis(x, mesh: Mesh, axis_name: str = TIME_AXIS):
    """place an array with sharding along its leading (time) axis."""
    sharding = NamedSharding(mesh, PartitionSpec(axis_name))
    return jax.device_put(x, sharding)


def pad_to_shard_multiple(x, mesh: Mesh, multiple: int = 1, axis: int = 0):
    """zero-pad the time axis so each shard holds a whole number of
    ``multiple``-sized blocks (host-side; static under jit)."""
    n_dev = int(np.prod(list(mesh.shape.values())))
    quantum = n_dev * multiple
    n = x.shape[axis]
    pad = (-n) % quantum
    if pad == 0:
        return x
    import jax.numpy as jnp

    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    xp = jnp if isinstance(x, jax.Array) else np
    return xp.pad(x, widths)
