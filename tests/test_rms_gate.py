"""Unit tests for the binary RMS gate's order-statistic envelopes
(scripts/rms_error_tpu.py; VERDICT r2 #5).

The on-chip gate compares the TPU production monitor against the CPU
oracle; these tests pin the host-side envelope math it relies on:
- the APD count envelope at tol=0 is exactly the plain histogram, and
  at tol>0 it brackets every +-tol-perturbed histogram;
- the psd_max tie band [top2*(1-tol), top1*(1+tol)] measures zero for
  any value explicable by a tie or in-contract element error.
"""

import os
import sys

import numpy as np

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 'scripts'),
)

from rms_error_tpu import TIER_TOL, _apd_count_envelope  # noqa: E402


def _plain_counts(p, edges):
    idx = np.searchsorted(edges, p, side='right')
    return np.bincount(idx, minlength=edges.size + 1)


def test_apd_envelope_tol0_is_plain_histogram():
    rng = np.random.default_rng(3)
    p = rng.gamma(2.0, 1.0, 20000)
    edges = np.linspace(0.05, 9.0, 129)
    cmin, cmax = _apd_count_envelope(p, edges, 0.0)
    plain = _plain_counts(p, edges)
    np.testing.assert_array_equal(cmin, plain)
    np.testing.assert_array_equal(cmax, plain)
    assert cmin.sum() == p.size


def test_apd_envelope_brackets_perturbed_histograms():
    rng = np.random.default_rng(4)
    p = rng.gamma(2.0, 1.0, 50000)
    edges = np.linspace(0.05, 9.0, 257)
    tol = 2e-3
    cmin, cmax = _apd_count_envelope(p, edges, tol)
    plain = _plain_counts(p, edges)
    assert (cmin <= plain).all() and (plain <= cmax).all()
    for seed in range(4):
        r2 = np.random.default_rng(seed)
        pert = p * (1.0 + tol * r2.uniform(-1.0, 1.0, p.size))
        h = _plain_counts(pert, edges)
        assert (h >= cmin).all() and (h <= cmax).all()
    # envelope must stay tight: a 10x-out-of-contract shift escapes it
    h_bad = _plain_counts(p * (1.0 + 50 * tol), edges)
    assert (h_bad > cmax).any() or (h_bad < cmin).any()


def test_apd_envelope_catches_count_errors():
    rng = np.random.default_rng(5)
    p = rng.gamma(2.0, 1.0, 50000)
    edges = np.linspace(0.05, 9.0, 257)
    cmin, cmax = _apd_count_envelope(p, edges, 1e-4)
    got = _plain_counts(p, edges).copy()
    # a kernel bug that drops samples from one bin and doubles another
    b = int(np.argmax(got))
    got[b // 2] += got[b]
    got[b] = 0
    assert (got < cmin).any() or (got > cmax).any()


def test_psd_max_tie_band_zero_inside_envelope():
    rng = np.random.default_rng(6)
    t1 = rng.uniform(1.0, 2.0, 512)
    t2 = t1 * rng.uniform(0.9, 1.0, 512)
    tol = 1e-4
    for got in (t1, t2, 0.5 * (t1 + t2), t1 * (1 + 0.5 * tol)):
        dev = np.maximum(
            0.0,
            np.maximum(got - t1 * (1 + tol), t2 * (1 - tol) - got),
        )
        assert float(np.abs(dev).max()) == 0.0
    # beyond the band the deviation is the distance to it
    got = t1 * (1 + 10 * tol)
    dev = np.maximum(
        0.0, np.maximum(got - t1 * (1 + tol), t2 * (1 - tol) - got)
    )
    np.testing.assert_allclose(dev, got - t1 * (1 + tol), rtol=1e-12)


def test_tier_tol_table_sane():
    assert set(TIER_TOL) == {'highest', 'high', 'i16', 'bf16'}
    assert TIER_TOL['highest'] < TIER_TOL['high'] < TIER_TOL['bf16']
    assert TIER_TOL['i16'] == TIER_TOL['high']
