"""Shared on-chip timing discipline for the scripts/ microbenches.

One copy of the axon-tunnel rules (CLAUDE.md): block_until_ready
returns at dispatch, so only a float32 readback fences; per-trial
difference pairs (12-rep minus 2-rep) subtract the fixed ~10 ms
round-trip; the median of >=3 trials rejects tunnel hiccups landing in
either term. bench.py keeps its own superset (fence_key plumbing + the
extend-on-disagreement rule) because the driver runs it standalone.
"""

import time

import numpy as np


def fence_vec(x):
    """reduce to a (8,) float32 leaf (0-d D2H hangs on the tunnel)."""
    import jax.numpy as jnp

    if jnp.iscomplexobj(x):
        x = x.real
    return jnp.broadcast_to(x.astype(jnp.float32).sum()[None], (8,))


def measure(step, *args, trials=3, reps_lo=2, reps_hi=12):
    """(median difference-pair seconds per call, compile+first seconds).

    ``step(*args)`` must return a float32 array (see fence_vec).
    """

    def run_and_fence(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = step(*args)
        np.asarray(out)
        return time.perf_counter() - t0

    t_compile = run_and_fence(1)
    run_and_fence(2)  # warm
    dts = []
    for _ in range(trials):
        t_lo = run_and_fence(reps_lo)
        t_hi = run_and_fence(reps_hi)
        dts.append((t_hi - t_lo) / (reps_hi - reps_lo))
    return float(np.median(dts)), t_compile
