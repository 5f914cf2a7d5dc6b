"""Profiling helper tests."""

import jax
import jax.numpy as jnp
import numpy as np

from iqwaveform_tpu.utils import StageTimer, fence


def test_stage_timer():
    timer = StageTimer()
    with timer.stage('a'):
        x = fence(jax.jit(lambda v: v * 2.0)(jnp.ones(128)))
    with timer.stage('b'):
        y = fence(jnp.asarray(np.ones(4)))
    rep = timer.report()
    assert 'a' in rep and 'b' in rep and 'total' in rep
    assert timer.durations['a'] > 0


def test_fence_returns_tree():
    tree = {'x': jnp.ones(8), 'y': jnp.zeros(3, 'complex64')}
    out = fence(tree)
    assert out is tree
