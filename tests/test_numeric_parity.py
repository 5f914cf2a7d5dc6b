"""CI smoke subset of the numeric fuzz against the ACTUAL reference.

The full sweep lives in scripts/fuzz_vs_reference.py (it found the
power_spectral_density quantile-transpose crash and the time_fftshift
scale=None crash in the reference). It imports the reference package
with functional dependency emulations (scripts/_refload.py), which
installs stub modules into sys.modules — so this smoke test runs it in
a subprocess to keep the shared pytest interpreter clean.
"""

import os
import subprocess
import sys

SCRIPT = os.path.join(
    os.path.dirname(__file__), os.pardir, 'scripts', 'fuzz_vs_reference.py'
)


def test_fuzz_vs_reference_smoke():
    proc = subprocess.run(
        [sys.executable, SCRIPT, '2', '0'],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f'fuzz vs reference failed:\n{proc.stdout[-4000:]}\n{proc.stderr[-2000:]}'
    )
    assert 'all passed' in proc.stdout
