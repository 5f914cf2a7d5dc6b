"""Shared helpers for the Pallas TPU kernels.

Single source of truth for platform detection (whether pallas_call can
compile, vs falling back to interpret mode on hosts with no TPU lowering
target) and tile rounding, so the kernel modules cannot drift apart.
"""

from __future__ import annotations

import jax

LANES = 128


def on_tpu_like() -> bool:
    """True when the default backend lowers Pallas TPU kernels (a real
    TPU, or the tunneled axon attachment)."""
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ('tpu', 'axon')


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m
