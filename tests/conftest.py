"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Set before any jax import so sharding tests exercise real multi-device
code paths without TPU hardware, and so tests never contend for the
single tunneled TPU chip.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

# a Pallas kernel failure must FAIL tests, not silently fall back to the
# XLA formulation (VERDICT r2 weak #6); production keeps the permissive
# default for tunneled attachments with partial Mosaic support
os.environ.setdefault('IQWAVEFORM_TPU_STRICT_KERNELS', '1')

import jax

# the axon sitecustomize pins jax_platforms to the tunneled TPU; tests run
# on the virtual 8-device CPU mesh instead (fast, and exercises sharding)
jax.config.update('jax_platforms', 'cpu')

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


from _synth import make_cp_waveform, make_tone_noise  # noqa: E402 (re-export)


@pytest.fixture
def tone_noise():
    return make_tone_noise
