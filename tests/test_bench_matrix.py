"""bench.py matrix bookkeeping (host-only logic, no chip).

ADVICE r4: a partial/failing session must merge into — never truncate —
docs/BENCH_matrix.json, and failed configs must be recorded visibly.
VERDICT r4 #2: matrix rows carry median + spread over recent sessions.
"""

import importlib.util
import json
import os

import pytest


@pytest.fixture(scope='module')
def bench():
    spec = importlib.util.spec_from_file_location(
        'bench',
        os.path.join(os.path.dirname(__file__), os.pardir, 'bench.py'),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _row(metric, value, unit='MS/s', vs=True):
    r = {'metric': metric, 'value': value, 'unit': unit}
    if vs:
        r['vs_baseline'] = round(value / 768.0, 3)
    return r


def test_merge_medians_and_spread(bench):
    history = {}
    for i, v in enumerate([1000.0, 1100.0, 900.0]):
        bench._record_session(history, f's{i}', [_row('m', v)])
    (row,) = bench._merged_rows(history)
    assert row['value'] == 1000.0
    assert row['n_sessions'] == 3
    assert row['spread_pct'] == pytest.approx(20.0)
    assert row['vs_baseline'] == pytest.approx(1000.0 / 768.0, rel=1e-3)


def test_merge_window_keeps_recent_sessions(bench):
    history = {}
    for i in range(10):
        bench._record_session(history, f's{i}', [_row('m', 100.0 + i)])
    (row,) = bench._merged_rows(history)
    assert row['n_sessions'] == bench.HISTORY_WINDOW
    # sessions 5..9 -> median 107
    assert row['value'] == 107.0


def test_partial_session_preserves_other_metrics(bench, tmp_path, monkeypatch):
    """a session measuring only one config must keep every previously
    recorded metric in the written matrix (the round-4 truncation bug)."""
    monkeypatch.setattr(bench, 'MATRIX_PATH', str(tmp_path / 'matrix.json'))
    monkeypatch.setattr(bench, 'HISTORY_PATH', str(tmp_path / 'hist.json'))

    history = {}
    bench._record_session(
        history, 'old', [_row('a', 100.0), _row('b', 200.0)]
    )
    bench._write_matrix(history, 'old', [])

    # new session re-measures only 'a' and fails on 'c'
    bench._record_session(history, 'new', [_row('a', 120.0)])
    bench._write_matrix(history, 'new', [('c', 'rc=1')])

    with open(bench.MATRIX_PATH) as f:
        rows = {r['metric']: r for r in json.load(f)}
    assert set(rows) == {'a', 'b'}
    assert rows['a']['value'] == 110.0  # median of 100, 120
    assert rows['a']['n_sessions'] == 2
    assert rows['b']['value'] == 200.0

    with open(bench.HISTORY_PATH) as f:
        hist = json.load(f)
    assert hist['_failures'][-1] == {
        'session': 'new', 'configs': {'c': 'rc=1'}
    }


def test_units_without_baseline_stay_clean(bench):
    history = {}
    bench._record_session(
        history, 's0', [_row('frames', 1e6, unit='frames/s', vs=False)]
    )
    (row,) = bench._merged_rows(history)
    assert 'vs_baseline' not in row
    assert row['unit'] == 'frames/s'
