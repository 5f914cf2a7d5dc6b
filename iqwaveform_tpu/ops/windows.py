"""Window functions not included by scipy.signal.

Feature parity: reference windows.py:1-123 (knab, modified_bessel, cosh,
acg, register_extra_windows).

These are host-side design functions: they run in float64 numpy at trace
time and their outputs become compile-time constants in jitted pipelines,
exactly like the reference (whose windows are host numpy fed to cupy).
"""

from __future__ import annotations

import numpy as np

from ..utils import lazy_import

special = lazy_import('scipy.special')
signal = lazy_import('scipy.signal')

__all__ = ['acg', 'cosh', 'knab', 'modified_bessel', 'register_extra_windows']


def _len_guards(M):
    """Handle small or incorrect window lengths (reference windows.py:10-14)."""
    if int(M) != M or M < 0:
        raise ValueError('Window length M must be a non-negative integer')
    return M <= 1


def _extend(M, sym):
    """Extend window by 1 sample if needed for DFT-even symmetry
    (reference windows.py:17-22)."""
    if not sym:
        return M + 1, True
    else:
        return M, False


def _truncate(w, needed):
    """(reference windows.py:25-30)"""
    if needed:
        return w[:-1]
    else:
        return w


def knab(M: int, alpha, sym=True) -> np.ndarray:
    """Knab window (reference windows.py:33-46): sinh-based window with
    endpoint limit pi*alpha/sinh(pi*alpha), normalized to unit energy."""
    if _len_guards(M):
        return np.ones(M)
    M, needs_trunc = _extend(M, sym)

    t = np.linspace(-0.5, 0.5, M)

    sqrt_term = np.sqrt(1 - (2 * t) ** 2)
    w = np.sinh((np.pi * alpha) * sqrt_term) / (np.sinh(np.pi * alpha) * sqrt_term)

    w[0] = w[-1] = np.pi * alpha / np.sinh(np.pi * alpha)
    w /= np.sqrt(np.sum(w**2))

    return _truncate(w, needs_trunc)


def modified_bessel(M, alpha, sym=True):
    """Modified-Bessel window (reference windows.py:49-65)."""
    if _len_guards(M):
        return np.ones(M)
    M, needs_trunc = _extend(M, sym)

    t = np.linspace(-0.5, 0.5, M)

    sqrt_term = np.sqrt(1 - (2 * t) ** 2)
    w = special.i1((np.pi * alpha) * sqrt_term) / (
        special.i1(np.pi * alpha) * sqrt_term
    )

    w[0] = w[-1] = 0

    w /= np.sqrt(np.sum(w**2))

    return _truncate(w, needs_trunc)


def cosh(M: int, alpha, sym=True) -> np.ndarray:
    """cosh window (reference windows.py:68-82)."""
    if _len_guards(M):
        return np.ones(M)
    M, needs_trunc = _extend(M, sym)

    t = np.linspace(-0.5, 0.5, M)

    sqrt_term = np.sqrt(1 - (2 * t) ** 2)
    w = np.cosh((np.pi * alpha) * sqrt_term) / (np.cosh(np.pi * alpha) * sqrt_term)

    w[0] = w[-1] = 1 / np.cosh(np.pi * alpha)

    w /= np.sqrt(np.sum(w**2))

    return _truncate(w, needs_trunc)


def acg(M: int, sigma_t: float, sym=True, dtype='float64'):
    """approximate confined gaussian window (reference windows.py:85-112).

    Args:
        M: window size, in samples
        sigma_t: the (3-dB) uncertainty resolution in time bins

    Reference:
        S. Starosielec, D. Haegele, "Discrete-time windows with minimal RMS
        bandwidth for given RMS temporal width," Signal Processing Vol. 102,
        Sept. 2014, pp. 240-246.
    """
    if _len_guards(M):
        return np.ones(M)

    M, needs_trunc = _extend(M, sym)

    def G(k, sigma_t=sigma_t):
        inner = (k - (M - 1) / 2) / (2 * M * sigma_t)
        return np.exp(-(inner**2))

    k = np.arange(M, dtype=dtype)
    w = G(k) - G(-0.5) * (G(k + M) + G(k - M)) / (G(-0.5 + M) + G(-0.5 - M))
    w /= w.max()

    return _truncate(w, needs_trunc)


_registered = False


def _adapt_signature(func):
    """wrap an extra window so it tolerates the xp=/device= kwargs that
    scipy >= 1.15 get_window passes to registered window functions."""
    import functools

    @functools.wraps(func)
    def wrapped(M, *args, sym=True, xp=None, device=None):
        w = func(M, *args, sym=sym)
        if xp is not None:
            w = xp.asarray(w)
        return w

    return wrapped


def register_extra_windows():
    """register 'acg', 'cosh', 'modified_bessel', and 'knab' for access by
    scipy.signal.get_window (reference windows.py:115-123).

    Handles both scipy registry layouts: the legacy ``_win_equiv`` dict and
    the (func, has_args) ``_WIN_FUNCS`` table of scipy >= 1.15.
    """
    global _registered
    if _registered:
        return

    extras = {
        'acg': acg,
        'cosh': cosh,
        'modified_bessel': modified_bessel,
        'knab': knab,
    }

    windows_mod = signal.windows._windows
    if hasattr(windows_mod, '_win_equiv'):
        registry = windows_mod._win_equiv
        registry.update(extras)
    elif hasattr(windows_mod, '_WIN_FUNCS'):
        for name, func in extras.items():
            windows_mod._WIN_FUNCS[name] = (_adapt_signature(func), True)
    else:
        raise RuntimeError('unsupported scipy window registry layout')

    _registered = True
