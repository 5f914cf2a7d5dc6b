"""CI smoke subset of the randomized parity fuzz harness.

The full sweep lives in scripts/fuzz_parity.py (it found the
pad_along_axis multi-dim broadcast bug); this runs a few fixed seeds of
every fuzzer so the harness itself stays importable and the dual-path
contracts stay exercised under CI time bounds.
"""

import os
import sys

import numpy as np
import pytest
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, 'scripts'))

import fuzz_parity  # noqa: E402


@pytest.mark.parametrize('fuzzer', fuzz_parity.FUZZERS, ids=lambda f: f.__name__)
@pytest.mark.parametrize('case', [0, 1, 2])
def test_fuzz_case(fuzzer, case):
    rng = np.random.default_rng(
        case * 997 + zlib.crc32(fuzzer.__name__.encode()) % 65536
    )
    fuzzer(rng)
