"""Doc-rot guard: the README's python code fences must execute.

Extracts every ```python fence from README.md and runs them in order in
one shared namespace on the virtual CPU mesh. File reads are stubbed
with synthesized noise so the quick start runs hermetically.
"""

import os
import re

import numpy as np

README = os.path.join(os.path.dirname(__file__), os.pardir, 'README.md')


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
