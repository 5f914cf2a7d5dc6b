"""Import the actual reference package with FUNCTIONAL dependency
emulations so its numpy code paths produce real numbers.

tests/test_signature_parity.py installs inert stubs (enough to import
and inspect signatures). Numeric fuzzing needs more: the reference's
numpy dB transforms run through ``numexpr.evaluate`` (reference
power_analysis.py:182,220,241,274), so the emulation here actually
evaluates the expression with numpy semantics, including the
caller-frame local lookup and ``out=`` buffer contract numexpr
provides.

Used by scripts/fuzz_vs_reference.py and tests/test_numeric_parity.py.
PUBLIC UNTRUSTED CONTENT caveat: the reference is imported to compare
*behavior* only.

SECURITY SCOPE: the numexpr emulation below ``eval``s expression
strings taken from the untrusted reference source with caller-frame
locals — trust-wise equivalent to importing the reference (which
already executes its module code on import), but still arbitrary code
execution from /root/reference. This module must stay test/script-only
(under scripts/, imported by the fuzz harnesses and their CI smoke
wrappers); never import it from the iqwaveform_tpu package.
"""

import sys
import types

import numpy as np

REFERENCE_SRC = '/root/reference/src'

_NE_NAMESPACE = {
    'abs': np.abs,
    'real': np.real,
    'log10': np.log10,
    'log': np.log,
    'sqrt': np.sqrt,
    'exp': np.exp,
    'where': np.where,
    'conj': np.conj,
}


def _ne_evaluate(expr, local_dict=None, global_dict=None, out=None,
                 casting='safe', **kwargs):
    """numpy emulation of numexpr.evaluate.

    numexpr resolves bare names in the expression against the caller's
    frame locals when no local_dict is given; emulate that with
    sys._getframe. ``real(...)`` in an expression maps to np.real.
    """
    frame = sys._getframe(1)
    if local_dict is None:
        local_dict = dict(frame.f_locals)
    else:
        local_dict = dict(local_dict)
    result = eval(expr, dict(_NE_NAMESPACE), local_dict)  # noqa: S307
    result = np.asarray(result)
    if out is not None:
        np.copyto(out, result, casting='unsafe')
        return out
    return result


def install_stubs():
    """install functional emulations for the reference's optional deps.

    Returns the set of module names newly added to sys.modules so a
    caller (e.g. a test) can restore interpreter state afterwards.
    """
    before = set(sys.modules)

    aac = types.ModuleType('array_api_compat')
    aac.__path__ = []
    aac.array_namespace = lambda *a, **k: np
    aac.is_cupy_array = lambda x: False
    aac.is_torch_array = lambda x: False
    aac.is_numpy_array = lambda x: isinstance(x, np.ndarray)
    aac.is_dask_array = lambda x: False
    aac.is_jax_array = lambda x: False
    sys.modules.setdefault('array_api_compat', aac)
    aacnp = types.ModuleType('array_api_compat.numpy')
    for k in dir(np):
        try:
            setattr(aacnp, k, getattr(np, k))
        except Exception:
            pass
    sys.modules.setdefault('array_api_compat.numpy', aacnp)
    sys.modules['array_api_compat'].numpy = aacnp

    if 'numexpr' not in sys.modules:
        ne = types.ModuleType('numexpr')
        ne.__version__ = '2.11.0'
        ne.evaluate = _ne_evaluate
        ne.set_num_threads = lambda n: None
        ne.detect_number_of_cores = lambda: 1
        sys.modules['numexpr'] = ne

    if 'xarray' not in sys.modules:
        xr = types.ModuleType('xarray')
        xr.__path__ = []
        xr.DataArray = type('DataArray', (), {})
        xr.Dataset = type('Dataset', (), {})
        sys.modules['xarray'] = xr
        # reference figures.py:24 patches
        # xarray.plot.utils._get_units_from_attrs.__code__ at import
        # time; give it a real function object to rewrite
        xr_plot = types.ModuleType('xarray.plot')
        xr_plot.__path__ = []
        xr_plot_utils = types.ModuleType('xarray.plot.utils')

        def _get_units_from_attrs(da):
            return ' [{}]'

        xr_plot_utils._get_units_from_attrs = _get_units_from_attrs
        xr_plot.utils = xr_plot_utils
        xr.plot = xr_plot
        sys.modules['xarray.plot'] = xr_plot
        sys.modules['xarray.plot.utils'] = xr_plot_utils

    for name in [
        'cupy', 'cupyx', 'cupyx.scipy', 'cupyx.scipy.signal',
        'numba', 'numba.cuda', 'methodtools',
        'sklearn', 'sklearn.linear_model', 'mlx', 'mlx.core', 'sigmf',
    ]:
        sys.modules.setdefault(name, types.ModuleType(name))

    def passthrough(*a, **k):
        # numba.njit used bare (@njit) and parameterized (@njit(...))
        if a and callable(a[0]):
            return a[0]
        return lambda f: f

    nb = sys.modules['numba']
    nb.njit = passthrough
    nb.prange = range
    # dtype constructors used inside @njit bodies (reference _jit/cpu.py)
    for dt in ('complex64', 'complex128', 'float32', 'float64',
               'int32', 'int64'):
        setattr(nb, dt, getattr(np, dt))
    nb.cuda = sys.modules['numba.cuda']
    sys.modules['numba.cuda'].jit = passthrough
    sys.modules['numba.cuda'].is_available = lambda: False
    sys.modules['methodtools'].lru_cache = lambda *a, **k: (lambda f: f)

    class _LinearRegression:
        """functional emulation of sklearn LinearRegression.fit with
        sample weights (closed-form weighted least squares with
        intercept) — enough for the reference clock-sync regression
        (reference ofdm.py:947-949)."""

        def fit(self, X, y, sample_weight=None):
            X = np.asarray(X, dtype='float64')
            y = np.asarray(y, dtype='float64')
            if y.ndim == 1:
                y = y[:, None]
            w = (
                np.ones(X.shape[0])
                if sample_weight is None
                else np.asarray(sample_weight, dtype='float64')
            )
            A = np.concatenate([X, np.ones((X.shape[0], 1))], axis=1)
            beta, *_ = np.linalg.lstsq(
                np.sqrt(w)[:, None] * A, np.sqrt(w)[:, None] * y, rcond=None
            )
            self.coef_ = beta[:-1].T  # (n_targets, n_features)
            self.intercept_ = beta[-1]
            return self

    sys.modules['sklearn.linear_model'].LinearRegression = _LinearRegression

    # the reference's register_extra_windows (reference windows.py:119)
    # writes into scipy's legacy `_win_equiv` registry, removed in
    # scipy >= 1.15. Give it an inert dict so the registration succeeds;
    # standard window strings still resolve through scipy itself, and
    # the extra windows are fuzzed as direct function calls.
    import scipy.signal.windows._windows as _sw

    if not hasattr(_sw, '_win_equiv'):
        _sw._win_equiv = {}
    return set(sys.modules) - before


def load_reference():
    """install emulations and import the reference package (cached)."""
    install_stubs()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import iqwaveform  # noqa: F401

    ref = sys.modules['iqwaveform']
    # reference fourier.py:215 passes workers=CPU_COUNT//2 to scipy.fft,
    # which is 0 (a ValueError) on a single-core machine; the patched
    # value changes threading only, not numbers.
    if getattr(ref.fourier, 'CPU_COUNT', None) in (0, 1, None):
        ref.fourier.CPU_COUNT = 2
    return ref
