"""CI smoke subset of the crash-robustness fuzz.

The full sweep lives in scripts/fuzz_robustness.py (it found the odd-
nperseg real-input fftshift corruption and five wrong-exception-class
validation gaps). Runs every fuzzer at a few fixed seeds so hostile
input keeps raising deliberate errors, not internal crashes.
"""

import os
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, 'scripts'))

import fuzz_robustness  # noqa: E402


@pytest.mark.parametrize(
    'fuzzer', fuzz_robustness.FUZZERS, ids=lambda f: f.__name__
)
@pytest.mark.parametrize('case', [0, 1, 2, 3, 4])
def test_robustness_case(fuzzer, case):
    rng = np.random.default_rng(
        case * 997 + zlib.crc32(fuzzer.__name__.encode()) % 65536
    )
    try:
        fuzzer(rng)
    except fuzz_robustness.DELIBERATE:
        pass
