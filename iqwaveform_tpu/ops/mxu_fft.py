"""FFT on the MXU: four-step Cooley-Tukey as dense DFT matmuls.

XLA's TPU FFT lowers to a vector-unit implementation that leaves the
systolic array idle. For the batched mid-size FFTs that dominate this
framework's pipelines (1k-16k points, thousands of frames), the four-step
factorization n = a*b turns each transform into two dense complex matmuls
with MXU-native shapes:

    A = x.reshape(batch, a, b)          # row-major split i = i1*b + i2
    B = F_a @ A                         # length-a DFTs down the columns
    C = B * W                           # twiddles W[k1, i2] = w_n^(k1*i2)
    D = C @ F_b                         # length-b DFTs along the rows
    X[k2*a + k1] = D[k1, k2]            # transposed readout

F_a (a x a), F_b (b x b) and W (a x b) are host-precomputed constants.
Complex matmuls lower to real MXU matmuls; with HIGHEST precision the
result matches jnp.fft.fft to float32 roundoff (~1e-6 relative).

Cost: 2 n (a + b) complex MACs per transform vs (5/2) n log2 n for a true
FFT — for a = b = sqrt(n) that is asymptotically worse by
2 sqrt(n)/log2(n), but every MAC runs at MXU rate, which beats the
VPU-bound XLA FFT by an order of magnitude at these sizes.
"""

from __future__ import annotations

import math
import typing

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import lru_cache

_LANES = 128  # MXU tile / full contraction width

__all__ = ['fft_mxu', 'ifft_mxu', 'four_step_factored', 'plan_factors']


@lru_cache()
def plan_factors(n: int) -> tuple:
    """pick the (a, b) split for the four-step transform.

    Contraction width is what matters on the MXU: a factor below 128
    contracts at partial width (a 32-wide contraction runs at ~1/4
    utilization). So: use the balanced split when both of its factors
    are >= 128 (full width everywhere, minimal n*(a+b) MAC count and
    smallest DFT-matrix constants). Otherwise — n < 16384, where any
    balanced split is sub-width — put the largest divisor <= 128 on
    the minor-axis stage-2 contraction (a v5e shoot-out at
    (16384 frames x 1024): b=128/a=8 runs 1.94 ms vs 2.65 ms for the
    balanced 32x32 split and 2.53 ms for the XLA FFT). For n <= 128
    this degenerates to a = 1, i.e. one direct (n, n) DFT matmul —
    optimal there, and it makes primes <= 128 legal sizes."""
    balanced = None
    for a in range(2, int(math.isqrt(n)) + 1):
        if n % a == 0:
            balanced = (n // a, a)
    if balanced is not None and balanced[1] >= _LANES:
        return balanced
    b = 1
    for d in range(2, min(n, _LANES) + 1):
        if n % d == 0:
            b = d
    if b > 1:
        return (n // b, b)
    if balanced is not None:
        # every divisor > 128 (e.g. squares of primes > 128)
        return balanced
    raise ValueError(f'n={n} is prime; no four-step factorization')


@lru_cache()
def _dft_constants(n: int, inverse: bool):
    """host-side DFT matrices + twiddles (embed into traces as constants)."""
    a, b = plan_factors(n)
    sign = 2j if inverse else -2j

    i1 = np.arange(a)
    i2 = np.arange(b)
    Fa = np.exp(sign * np.pi * np.outer(i1, i1) / a).astype('complex64')
    Fb = np.exp(sign * np.pi * np.outer(i2, i2) / b).astype('complex64')
    W = np.exp(sign * np.pi * np.outer(i1, i2) / n).astype('complex64')
    return a, b, Fa, Fb, W


def four_step_factored(x, n: int, *, inverse: bool = False, precision=None):
    """four-step DFT of the last axis, returned in FACTORED coordinates:
    output D[..., k1, k2] holds natural bin k = k2*a + k1, with
    (a, b) = plan_factors(n).

    Consumers that only need bin-order-independent reductions (channel
    power sums, statistics) can work on D directly and skip the
    transposed readout — at channelizer shapes the (..., a, b) swapaxes
    is a full-array lane/sublane shuffle that dominates the transform's
    HBM traffic."""
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    a, b, Fa, Fb, W = _dft_constants(n, inverse)

    batch = x.shape[:-1]
    A = x.reshape(batch + (a, b))

    # length-a DFTs down the columns: (a x a) @ (..., a, b)
    B = jnp.einsum('ij,...jk->...ik', Fa, A, precision=precision)
    C = B * W  # twiddles broadcast over batch
    # length-b DFTs along the rows: (..., a, b) @ (b x b)
    D = jnp.einsum('...ij,jk->...ik', C, Fb, precision=precision)
    return D


def _four_step(x, n: int, inverse: bool, precision):
    D = four_step_factored(x, n, inverse=inverse, precision=precision)
    batch = x.shape[:-1]

    # transposed readout: X[k2*a + k1] = D[k1, k2]
    X = jnp.swapaxes(D, -1, -2).reshape(batch + (n,))
    if inverse:
        X = X / n
    return X


def fft_mxu(x, axis: int = -1, *, precision=jax.lax.Precision.HIGHEST):
    """FFT along ``axis`` via MXU matmuls. Static length must be composite."""
    x = jnp.asarray(x)
    if not jnp.iscomplexobj(x):
        x = x.astype(jnp.complex64)
    n = x.shape[axis]
    if axis not in (-1, x.ndim - 1):
        x = jnp.moveaxis(x, axis, -1)
        out = _four_step(x, n, False, precision)
        return jnp.moveaxis(out, -1, axis)
    return _four_step(x, n, False, precision)


def ifft_mxu(x, axis: int = -1, *, precision=jax.lax.Precision.HIGHEST):
    """inverse FFT along ``axis`` via MXU matmuls."""
    x = jnp.asarray(x)
    if not jnp.iscomplexobj(x):
        x = x.astype(jnp.complex64)
    n = x.shape[axis]
    if axis not in (-1, x.ndim - 1):
        x = jnp.moveaxis(x, axis, -1)
        out = _four_step(x, n, True, precision)
        return jnp.moveaxis(out, -1, axis)
    return _four_step(x, n, True, precision)


# ---- fused OLA spectral transform (fft -> zero -> trim -> ifft) ----


def fused_ola_supported(nfft: int, nfft_out: int, bounds_in, bounds_out) -> bool:
    """True when the fused factored-coordinate path applies: both sizes
    share the leading factor a and the effective full-width input window
    (input bin that lands on output bin 0) is a-aligned.

    Narrow passbands are supported by copying a full nfft_out-wide input
    window and folding the output zero margins into the 2-D mask — the
    margins are zeroed either way, so only the bin alignment matters."""
    try:
        a, b = plan_factors(nfft)
    except ValueError:
        return False
    if nfft_out > nfft or nfft_out % a != 0:
        return False
    in_start = bounds_in[0] - bounds_out[0]
    return (
        in_start >= 0
        and in_start + nfft_out <= nfft
        and in_start % a == 0
    )


@lru_cache()
def _fused_ola_constants(
    nfft: int,
    nfft_out: int,
    zero_lo: int,
    zero_hi,
    in_lo: int,
    in_hi: int,
    out_lo: int,
    factors: tuple = None,
):
    a, b = plan_factors(nfft) if factors is None else factors
    b2 = nfft_out // a

    # full-width aligned input window: input bin in_start lands on output
    # bin 0; bins outside [in_lo, in_hi) are masked to zero (the output's
    # zero margins), so over-copying is harmless
    in_start = in_lo - out_lo

    i1 = np.arange(a)
    i2 = np.arange(b)
    Fa = np.exp(-2j * np.pi * np.outer(i1, i1) / a).astype('complex64')
    W = np.exp(-2j * np.pi * np.outer(i1, i2) / nfft).astype('complex64')
    # forward length-b DFT restricted to the kept k2 columns (the trim
    # fused into the matmul)
    k2_kept = np.arange(in_start // a, (in_start + nfft_out) // a)
    Fb_kept = np.exp(-2j * np.pi * np.outer(i2, k2_kept) / b).astype('complex64')

    # combined mask on the kept (k1, k2') grid: natural input bin index
    # k = k2*a + k1 must lie in the passband AND in the copied range
    k1g, k2g = np.meshgrid(np.arange(a), k2_kept, indexing='ij')
    k_nat = k2g * a + k1g
    zhi = nfft if zero_hi is None else zero_hi
    mask = (
        (k_nat >= zero_lo) & (k_nat < zhi) & (k_nat >= in_lo) & (k_nat < in_hi)
    ).astype('float32')

    # inverse constants for n' = nfft_out = a * b2, consumed directly in
    # factored (k1, k2') order
    i2p = np.arange(b2)
    Fb2_inv = (
        np.exp(2j * np.pi * np.outer(i2p, i2p) / b2) / b2
    ).astype('complex64')
    Wp_conj = np.exp(2j * np.pi * np.outer(i1, i2p) / nfft_out).astype('complex64')
    Fa_inv = (np.exp(2j * np.pi * np.outer(i1, i1) / a) / a).astype('complex64')

    return a, b, b2, Fa, W, Fb_kept, mask, Fb2_inv, Wp_conj, Fa_inv


@lru_cache()
def _fused_ola_constants_folded(
    nfft, nfft_out, zero_lo, zero_hi, in_lo, in_hi, out_lo, factors=None,
):
    """mask-folded constants: passband mask + k2-inverse DFT collapse
    into the forward trim matmul.

    In factored coordinates the natural bin k = k2*a + k1 makes any
    contiguous passband a COLUMN structure on the kept (k1, k2') grid:
    interior columns all-pass, outer columns all-zero, and at most two
    boundary columns carry a k1-dependent 0/1 profile (the passband is
    an intersection of intervals in k, hence one interval — never more
    than two partial columns). The three middle stages

        D = C @ Fb_kept ;  D *= mask ;  Cp = D @ Fb2_inv

    therefore fold EXACTLY into one matmul plus ≤2 rank-1 corrections:

        Cp = C @ H0  +  Σ_s (p_s ⊙ (C @ Fb_kept[:, j_s])) ⊗ Fb2_inv[j_s, :]

    with H0 = Fb_kept @ diag(m_int) @ Fb2_inv precomputed here in
    float64 (m_int keeps interior columns, zeroes boundary + outside).
    The correction contractions are thin (one column each) — consumers
    evaluate them on the VPU (lane reductions), so an entire complex
    matmul stage (1/4 of the MXU passes) disappears with no accuracy
    or semantics change.

    Returns (a, b, b2, Fa, W, H0, n_corr, prof[a, 2] f32,
    fbcols[b, 2] c64, vrows[2, b2] c64, Wp_conj, Fa_inv); the three
    correction constants are zero-padded to 2 slots so kernel
    signatures stay static (n_corr ∈ {0, 1, 2} is the live count).

    Reference semantics folded here: fourier.py:707-719
    (zero_stft_by_freq) + fourier.py:866-924 (downsample_stft).
    """
    a, b = plan_factors(nfft) if factors is None else factors
    b2 = nfft_out // a
    in_start = in_lo - out_lo

    i1 = np.arange(a)
    i2 = np.arange(b)
    Fa = np.exp(-2j * np.pi * np.outer(i1, i1) / a)
    W = np.exp(-2j * np.pi * np.outer(i1, i2) / nfft)
    k2_kept = np.arange(in_start // a, (in_start + nfft_out) // a)
    Fb_kept = np.exp(-2j * np.pi * np.outer(i2, k2_kept) / b)

    k1g, k2g = np.meshgrid(np.arange(a), k2_kept, indexing='ij')
    k_nat = k2g * a + k1g
    zhi = nfft if zero_hi is None else zero_hi
    mask = (k_nat >= zero_lo) & (k_nat < zhi) & (k_nat >= in_lo) & (k_nat < in_hi)

    i2p = np.arange(b2)
    Fb2_inv = np.exp(2j * np.pi * np.outer(i2p, i2p) / b2) / b2
    Wp_conj = np.exp(2j * np.pi * np.outer(i1, i2p) / nfft_out)
    Fa_inv = np.exp(2j * np.pi * np.outer(i1, i1) / a) / a

    full = mask.all(axis=0)
    partial = np.flatnonzero(~full & mask.any(axis=0))
    if partial.size > 2:
        # unreachable for interval masks; guards future mask shapes
        raise ValueError('passband mask has >2 partial columns')

    H0 = Fb_kept @ (full[:, None] * Fb2_inv)
    prof = np.zeros((a, 2), 'float32')
    fbcols = np.zeros((b, 2), 'complex128')
    vrows = np.zeros((2, b2), 'complex128')
    for s, j in enumerate(partial):
        prof[:, s] = mask[:, j]
        fbcols[:, s] = Fb_kept[:, j]
        vrows[s] = Fb2_inv[j]

    c64 = lambda m: m.astype('complex64')  # noqa: E731
    return (
        a, b, b2, c64(Fa), c64(W), c64(H0), int(partial.size), prof,
        c64(fbcols), c64(vrows), c64(Wp_conj), c64(Fa_inv),
    )


def fused_ola_mxu(
    frames,
    *,
    nfft: int,
    nfft_out: int,
    zero_lo: int,
    zero_hi,
    bounds_in,
    bounds_out=(0, None),
    precision=jax.lax.Precision.HIGHEST,
    fold: typing.Union[bool, str] = True,
):
    """forward FFT -> passband zero -> frequency trim -> inverse FFT of a
    frame batch, entirely in factored (k1, k2) coordinates.

    The four-step FFT's final transpose exists only to produce natural bin
    order; the OLA filter consumes bins and immediately inverts, so both
    transposes are dropped: the zero mask is a (k1, k2') constant and the
    trim is column selection of the length-b DFT matrix (which also halves
    that matmul for 2:1 resampling). ~20% fewer MACs and ~270 MB/step less
    HBM traffic than separate fft_mxu/ifft_mxu calls at bench shapes.

    frames: (M, nfft) complex -> (M, nfft_out) complex time domain
    (without the ISTFT time-shift window, which the caller applies).

    fold=True (default) additionally collapses trim + mask + k2-inverse
    into one precomputed matmul (_fused_ola_constants_folded): one fewer
    einsum and one fewer (M, a, b2) HBM round trip, exactly equal
    results up to float32 rounding. The fold engages only when the
    passband edges land on exact k1-column boundaries (n_corr == 0): on
    the XLA path the ≤2 rank-1 boundary-correction einsums are
    pass-bound s≤2-wide dots that cost more than the removed Fb2_inv
    matmul saves (measured 1.03x SLOWER at flagship shapes vs 0.91x
    faster without corrections — scripts/probe_fold_xla.py; the Pallas
    kernels keep their folded path, where the corrections are cheap VPU
    lane reductions). fold=False keeps the literal four-matmul chain
    (cross-validation path). fold='force' folds even when boundary
    corrections are required (n_corr > 0), keeping the
    corrections-as-einsums variant measurable — a probe/test sentinel,
    never the production choice.
    """
    in_lo, in_hi = bounds_in
    M = frames.shape[0]

    if fold:
        (a, b, b2, Fa, W, H0, n_corr, prof, fbcols, vrows, Wp_conj,
         Fa_inv) = _fused_ola_constants_folded(
            nfft, nfft_out, int(zero_lo), zero_hi, int(in_lo), int(in_hi),
            int(bounds_out[0]),
        )
        # fold='force' keeps the corrections-as-einsums path measurable
        # (scripts/probe_fold_xla.py); production never takes it
        fold = n_corr == 0 or fold == 'force'

    if fold:
        A = frames.reshape(M, a, b)
        B = jnp.einsum('ij,mjk->mik', Fa, A, precision=precision)
        C = B * W
        Cp = jnp.einsum('mij,jk->mik', C, H0, precision=precision)
        if n_corr:
            # ≤2 boundary-column rank-1 corrections (see constants doc)
            d = jnp.einsum('mij,js->mis', C, fbcols, precision=precision)
            Cp = Cp + jnp.einsum(
                'mis,sk->mik', d * prof, vrows, precision=precision
            )
        Bp = Cp * Wp_conj
        Ap = jnp.einsum('ij,mjk->mik', Fa_inv, Bp, precision=precision)
        return Ap.reshape(M, nfft_out)

    a, b, b2, Fa, W, Fb_kept, mask, Fb2_inv, Wp_conj, Fa_inv = _fused_ola_constants(
        nfft, nfft_out, int(zero_lo), zero_hi, int(in_lo), int(in_hi),
        int(bounds_out[0]),
    )
    A = frames.reshape(M, a, b)

    B = jnp.einsum('ij,mjk->mik', Fa, A, precision=precision)
    C = B * W
    D = jnp.einsum('mij,jk->mik', C, Fb_kept, precision=precision)  # (M, a, b2)
    D = D * mask

    Cp = jnp.einsum('mij,jk->mik', D, Fb2_inv, precision=precision)
    Bp = Cp * Wp_conj
    Ap = jnp.einsum('ij,mjk->mik', Fa_inv, Bp, precision=precision)

    return Ap.reshape(M, nfft_out)
