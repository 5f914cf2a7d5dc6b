"""Input-domain context and stream stand-ins.

Feature parity: reference util.py:144-166 (Domain, set_input_domain,
get_input_domain), util.py:169-195 (NonStreamContext, array_stream).

The domain stack is host-side Python state consulted at *trace time* by
pipeline entry points (power_spectral_density, iq_to_cyclic_power), so the
selected code path becomes a static branch in the compiled XLA program.

Streams: JAX dispatch is already asynchronous; ``array_stream`` returns a
no-op context whose ``synchronize`` maps to ``jax.block_until_ready`` when
handed a jax array, giving the same "fence" semantics the reference gets
from cupy streams (util.py:188-195).
"""

from __future__ import annotations

from contextlib import contextmanager
from enum import Enum

import jax

from .dispatch import is_jax_array


class Domain(Enum):
    TIME = 'time'
    FREQUENCY = 'frequency'
    TIME_BINNED_POWER = 'time_binned_power'


_input_domain = []


@contextmanager
def set_input_domain(domain):
    """set the current domain for input arrays of DSP calls
    (reference util.py:150-156)."""
    i = len(_input_domain)
    _input_domain.append(Domain(domain))
    try:
        yield
    finally:
        del _input_domain[i]


def get_input_domain(default=Domain.TIME):
    """(reference util.py:159-166)"""
    Domain(default)  # validate

    if len(_input_domain) > 0:
        return _input_domain[-1]
    else:
        return default


class NonStreamContext:
    """do-nothing stream duck type (reference util.py:169-185), optionally
    fencing on a jax array when synchronize() is called."""

    def __init__(self, *args, obj=None, **kws):
        self._obj = obj

    def __enter__(self):
        return self

    def __exit__(self, *args):
        pass

    def synchronize(self):
        if self._obj is not None and is_jax_array(self._obj):
            jax.block_until_ready(self._obj)

    def use(self):
        pass


def array_stream(obj, null=False, non_blocking=False, ptds=False):
    """returns a stream-like context appropriate for obj
    (reference util.py:188-195)."""
    return NonStreamContext(obj=obj)
