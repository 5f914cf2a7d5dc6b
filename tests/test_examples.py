"""Smoke tests: every example script runs end-to-end as a subprocess.

Examples are the first code a migrating user runs; these tests keep them
from rotting as the API evolves. Each example forces the CPU backend
unless EXAMPLE_ON_TPU is set, so the subprocesses never touch the chip.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(name, *argv, timeout=300):
    env = dict(os.environ)
    env.pop('EXAMPLE_ON_TPU', None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'examples', name), *argv],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, f'{name} failed:\n{proc.stdout}\n{proc.stderr}'
    return proc.stdout


def test_cell_search_example():
    out = _run_example('cell_search.py')
    assert 'cell identity recovered' in out
    assert 'N_id=635' in out


def test_wideband_monitor_example(tmp_path):
    out = _run_example('wideband_monitor.py', str(tmp_path))
    assert 'wideband_monitor.png' in out
    assert (tmp_path / 'wideband_monitor.png').stat().st_size > 10_000


def test_sharded_monitor_example():
    out = _run_example('sharded_monitor.py')
    assert 'apd totals:' in out
    # 2-D mesh path on the 8-device virtual host
    assert "'rx_batch': 2" in out or 'rx_batch' in out


def test_streaming_capture_example(tmp_path):
    out = _run_example('streaming_capture.py', str(tmp_path))
    assert 'streaming_capture done' in out
    assert 'strongest channel: 5' in out


def test_persistence_spectrum_example(tmp_path):
    out = _run_example('persistence_spectrum.py', str(tmp_path))
    assert 'persistence_spectrum done' in out
    assert (tmp_path / 'persistence_carry.npz').exists()


def test_disk_to_chip_example(tmp_path):
    # small chunks keep the CPU CI run fast while still crossing
    # multiple prefetcher chunk boundaries
    out = _run_example(
        'disk_to_chip.py', '--gigasamples', '0.005', '--chunk-log2', '21',
        '--out-dir', str(tmp_path), timeout=600,
    )
    assert 'including ingest' in out
    assert 'persistence peak at' in out


def test_disk_to_chip_monitor_i16(tmp_path):
    out = _run_example(
        'disk_to_chip.py', '--gigasamples', '0.005', '--monitor-i16',
        '--chunk-log2', '21', '--out-dir', str(tmp_path), timeout=600,
    )
    assert 'including ingest' in out
