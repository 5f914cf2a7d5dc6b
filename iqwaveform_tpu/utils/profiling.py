"""Tracing and per-stage timing helpers.

Aux-subsystem parity (SURVEY.md §5): the reference's only observability is
timing prints in the clock-sync loop (ofdm.py:1006-1015); here tracing is
first-class: `trace()` wraps jax.profiler for TensorBoard-viewable device
traces, and `StageTimer` gives cheap wall-clock stage breakdowns with
correct device fencing.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ['StageTimer', 'fence', 'trace']


def fence(tree):
    """block until every array in ``tree`` is computed.

    On standard backends this is jax.block_until_ready; on the tunneled
    axon platform (where block_until_ready returns at dispatch) it falls
    back to a float32 readback of one leaf.
    """
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(tree)

    leaves = jax.tree_util.tree_leaves(tree)
    for leaf in leaves:
        if hasattr(leaf, 'dtype') and leaf.dtype == jnp.float32:
            np.asarray(leaf)
            break
    return tree


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """device trace context (viewable in TensorBoard / Perfetto).

    Usage:
        with trace('/tmp/jax-trace'):
            out = pipeline(x)
            fence(out)
    """
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """wall-clock stage breakdown with device fencing.

    Usage:
        timer = StageTimer()
        with timer.stage('stft'):
            Y = fence(stft_fn(x))
        with timer.stage('stats'):
            s = fence(stats_fn(Y))
        print(timer.report())
    """

    def __init__(self):
        self.durations = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.durations[name] = self.durations.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self) -> str:
        total = sum(self.durations.values())
        lines = [f'total {total * 1e3:9.2f} ms']
        for name, dt in sorted(self.durations.items(), key=lambda kv: -kv[1]):
            pct = 100 * dt / total if total else 0
            lines.append(f'{name:24s} {dt * 1e3:9.2f} ms {pct:5.1f}%')
        return '\n'.join(lines)
