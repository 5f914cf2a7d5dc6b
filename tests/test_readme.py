"""Doc-rot guards for README.md.

* Every ```python fence must execute (run in order in one shared
  namespace on the virtual CPU mesh; file reads are stubbed with
  synthesized noise so the quick start runs hermetically).
* The benchmark table between the BENCH_MATRIX_TABLE markers must match
  a fresh render of docs/BENCH_matrix.json byte-for-byte (VERDICT r4 #1:
  the README drifted from the shipping matrix twice; this pins them).
"""

import importlib.util
import json
import os
import re

import numpy as np

README = os.path.join(os.path.dirname(__file__), os.pardir, 'README.md')
MATRIX = os.path.join(
    os.path.dirname(__file__), os.pardir, 'docs', 'BENCH_matrix.json'
)


def _python_fences(text):
    return re.findall(r'```python\n(.*?)```', text, flags=re.DOTALL)


def test_readme_snippets_execute():
    with open(README) as f:
        text = f.read()
    fences = _python_fences(text)
    assert fences, 'README has no python code fences'

    rng = np.random.default_rng(0)

    def fake_fromfile(path, dtype=None, **kws):
        n = 1 << 18
        return (
            rng.standard_normal(n) + 1j * rng.standard_normal(n)
        ).astype(dtype or 'complex64')

    ns = {}
    for fence in fences:
        code = fence.replace('np.fromfile', 'FAKE_FROMFILE')
        ns['FAKE_FROMFILE'] = fake_fromfile
        exec(compile(code, README, 'exec'), ns)

    # the quick start must have produced real results
    assert 'psd' in ns and 'y' in ns
    assert np.isfinite(np.asarray(ns['psd'])).all()


def test_readme_bench_table_matches_matrix():
    """README's benchmark table block == render_results.render_table of
    the shipping docs/BENCH_matrix.json (pure host string check — no
    chip needed). If this fails, run scripts/render_results.py and
    commit the regenerated README together with the matrix."""
    spec = importlib.util.spec_from_file_location(
        'render_results',
        os.path.join(
            os.path.dirname(__file__), os.pardir, 'scripts',
            'render_results.py',
        ),
    )
    rr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rr)

    with open(MATRIX) as f:
        rows = json.load(f)
    expected = rr.render_table(rows)

    with open(README) as f:
        text = f.read()
    m = re.search(
        re.escape(rr.START) + '\n(.*?)\n' + re.escape(rr.END),
        text,
        flags=re.DOTALL,
    )
    assert m, 'README BENCH_MATRIX_TABLE markers missing'
    assert m.group(1) == expected, (
        'README benchmark table drifted from docs/BENCH_matrix.json — '
        'run scripts/render_results.py and commit the result'
    )
