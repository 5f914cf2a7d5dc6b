"""Side-effect-free synthetic waveform helpers.

Shared by the test suite AND by scripts/validate_tpu.py. This module
must stay import-clean: no jax import, no jax.config mutation, no env
mutation. (Round-5 finding: validate_tpu imported `make_cp_waveform`
from test_ofdm mid-chip-session, which pulled in conftest — flipping
`jax_platforms` to 'cpu' and setting IQWAVEFORM_TPU_STRICT_KERNELS in
the middle of the on-chip run. Every gate after that import ran with
poisoned global state, and the "standalone repro" of the resulting
clock-sync failure silently ran on CPU, masking the real chip
behavior.)
"""

import numpy as np


def make_tone_noise(n, fs=1e6, f_tone=1e5, snr_db=10, seed=0, dtype='complex64'):
    """complex tone + noise test waveform."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    tone = np.exp(2j * np.pi * f_tone * t)
    noise_amp = 10 ** (-snr_db / 20) / np.sqrt(2)
    noise = noise_amp * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    return (tone + noise).astype(dtype)


def make_cp_waveform(phy, n_slots=4, seed=0):
    """synthesize a waveform with the CP structure of `phy`."""
    rng = np.random.default_rng(seed)
    cps = np.asarray(phy.cp_sizes)
    wave = []
    for k in range(n_slots):
        for i in range(len(cps)):
            s = (
                rng.standard_normal(phy.nfft) + 1j * rng.standard_normal(phy.nfft)
            ) / np.sqrt(2)
            wave += [s[-cps[i] :], s]
    return np.concatenate(wave).astype('complex64')
