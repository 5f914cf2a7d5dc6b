"""CI smoke for the provenance line-run scanner (docs/VERIFICATION.md §8).

Asserts no source file shares a contiguous run of >= 5 significant lines
with the reference tree outside the documented allowlist. Skipped where
the reference checkout is unavailable.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path('/root/reference/src/iqwaveform')


@pytest.mark.skipif(not REFERENCE.exists(), reason='reference tree unavailable')
def test_no_copied_line_runs():
    result = subprocess.run(
        [sys.executable, str(REPO / 'scripts' / 'scan_similarity.py'), '--min-run', '5'],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert result.returncode == 0, (
        'similarity scan found identical line runs:\n'
        + result.stdout
        + result.stderr
    )
