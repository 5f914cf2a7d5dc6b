"""Signature-level parity against the reference package.

Imports the actual reference (/root/reference/src) with its accelerator
and optional dependencies stubbed, then asserts that every public
function and class the reference defines in its core modules exists here
with at least the reference's parameters (or a **kwargs catch-all).

This is one level deeper than test_util.test_reference_facade_import_surface
(name-level): a user's call site written against the reference must not
hit a TypeError on a keyword we dropped.

figures/env are excluded: the reference's own imports there need real
xarray.plot / legacy IPython APIs this environment lacks; their surfaces
are pinned by tests/test_figures.py and the facade import test.
"""

import importlib
import inspect
import os
import sys
import types
import warnings

import numpy as np
import pytest

REFERENCE_SRC = '/root/reference/src'

CORE_MODULES = ['util', 'fourier', 'power_analysis', 'ofdm', 'windows', 'io']


def _install_reference_stubs():
    """stub the reference's cupy/numba/xarray/... deps so it imports.

    Returns the module names newly added to sys.modules so the caller
    can restore the interpreter state (a stub `xarray` left behind
    would otherwise make optional_import('xarray') in later tests
    return a fake)."""
    before = set(sys.modules)
    aac = types.ModuleType('array_api_compat')
    aac.__path__ = []
    aac.array_namespace = lambda *a, **k: np
    aac.is_cupy_array = lambda x: False
    aac.is_torch_array = lambda x: False
    sys.modules.setdefault('array_api_compat', aac)
    aacnp = types.ModuleType('array_api_compat.numpy')
    for k in dir(np):
        try:
            setattr(aacnp, k, getattr(np, k))
        except Exception:
            pass
    sys.modules.setdefault('array_api_compat.numpy', aacnp)
    aac.numpy = aacnp

    if 'xarray' not in sys.modules:
        xr = types.ModuleType('xarray')
        xr.DataArray = type('DataArray', (), {})
        xr.Dataset = type('Dataset', (), {})
        sys.modules['xarray'] = xr

    if 'numexpr' not in sys.modules:
        ne = types.ModuleType('numexpr')
        ne.__version__ = '2.10.0'
        ne.evaluate = lambda *a, **k: None
        ne.set_num_threads = lambda n: None
        ne.detect_number_of_cores = lambda: 1
        sys.modules['numexpr'] = ne

    for name in [
        'cupy', 'cupyx', 'cupyx.scipy', 'cupyx.scipy.signal',
        'numba', 'numba.cuda', 'methodtools',
        'sklearn', 'sklearn.linear_model', 'mlx', 'mlx.core', 'sigmf',
    ]:
        sys.modules.setdefault(name, types.ModuleType(name))
    passthrough = lambda *a, **k: (  # noqa: E731
        a[0] if a and callable(a[0]) else (lambda f: f)
    )
    sys.modules['numba'].njit = passthrough
    sys.modules['numba'].prange = range
    sys.modules['numba'].cuda = sys.modules['numba.cuda']
    sys.modules['numba.cuda'].jit = passthrough
    sys.modules['numba.cuda'].is_available = lambda: False
    sys.modules['methodtools'].lru_cache = lambda *a, **k: (lambda f: f)
    sys.modules['sklearn.linear_model'].LinearRegression = object
    return set(sys.modules) - before


def _missing_params(ref_obj, mine_obj):
    try:
        rs = inspect.signature(ref_obj)
        ms = inspect.signature(mine_obj)
    except (ValueError, TypeError):
        return []
    mp = ms.parameters
    if any(p.kind is inspect.Parameter.VAR_KEYWORD for p in mp.values()):
        return []
    return [q for q in rs.parameters if q not in mp]


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_SRC), reason='reference checkout unavailable'
)
def test_core_module_signatures_cover_reference():
    added = _install_reference_stubs()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)

    problems = []
    try:
        _audit(problems)
    finally:
        sys.path.remove(REFERENCE_SRC)
        for name in added | {
            m for m in sys.modules if m.split('.')[0] == 'iqwaveform'
        }:
            sys.modules.pop(name, None)
    assert not problems, '\n'.join(problems)


def _audit(problems):
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        for mod in CORE_MODULES:
            ref = importlib.import_module(f'iqwaveform.{mod}')
            mine = importlib.import_module(f'iqwaveform_tpu.{mod}')
            for n in dir(ref):
                if n.startswith('_'):
                    continue
                r = getattr(ref, n)
                if getattr(r, '__module__', '').split('.')[0] != 'iqwaveform':
                    continue
                m = getattr(mine, n, None)
                if inspect.isfunction(r):
                    if m is None:
                        problems.append(f'{mod}.{n}: missing')
                        continue
                    missing = _missing_params(r, m)
                    if missing:
                        problems.append(f'{mod}.{n}: params {missing}')
                elif inspect.isclass(r):
                    if m is None:
                        problems.append(f'{mod}.{n}: class missing')
                        continue
                    for meth in dir(r):
                        if meth.startswith('_') and meth != '__call__':
                            continue
                        rm = getattr(r, meth)
                        if not callable(rm) or meth in dir(object):
                            continue
                        mm = getattr(m, meth, None)
                        if mm is None:
                            problems.append(f'{mod}.{n}.{meth}: missing')
                            continue
                        missing = _missing_params(rm, mm)
                        if missing:
                            problems.append(
                                f'{mod}.{n}.{meth}: params {missing}'
                            )
