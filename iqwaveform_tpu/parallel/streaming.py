"""Streaming chunked reductions for captures larger than HBM.

The TPU-native replacement for the reference's bounded-memory chunked FFT
iteration (C5 in SURVEY.md §2: util.py:597-640 + fourier.py:188-197): a
``lax.scan`` over HBM-resident chunks carries compact sufficient
statistics (histograms, extrema, moments) so APD/CCDF and persistence
spectra run over arbitrarily long captures at fixed memory. Combined with
parallel.sharded, each chip scans its own time shard and the carries merge
with one final psum.

All carries are exact except quantiles, which use fixed-bin histogram
inversion (accuracy = bin width; see sharded.quantile_from_histogram).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.window_design import get_window
from ..utils.dispatch import unpack_iq

__all__ = [
    'PersistenceCarry',
    'apd_fold',
    'design_persistence',
    'load_carry',
    'persistence_apd_fold',
    'persistence_finalize',
    'persistence_fold',
    'persistence_init',
    'save_carry',
    'streaming_apd',
    'streaming_persistence_spectrum',
]


# module-level jitted transport splitters: a fresh jit lambda per call
# would re-trace and re-lower on every leaf readback (the exact-quantile
# refinement reads carries back each call)
@jax.jit
def _split_i32_planes(a):
    return (
        (a.reshape(-1) >> 12).astype(jnp.float32),
        (a.reshape(-1) & 0xFFF).astype(jnp.float32),
    )


@jax.jit
def _split_i64_planes(a):
    return (
        (a.reshape(-1) >> 40).astype(jnp.float32),
        ((a.reshape(-1) >> 20) & 0xFFFFF).astype(jnp.float32),
        (a.reshape(-1) & 0xFFFFF).astype(jnp.float32),
    )


@jax.jit
def _split_c64_planes(a):
    return a.reshape(-1).real, a.reshape(-1).imag


@jax.jit
def _flat_f32(a):
    return a.reshape(-1).astype(jnp.float32)


def _leaf_to_host(v):
    """exact host copy of a carry leaf through the axon-safe channel.

    The tunneled TPU's D2H path only supports float32 arrays produced
    by jit (int32 raises UNIMPLEMENTED, 0-d scalars hang — CLAUDE.md
    platform rules), so integer leaves leave the device as two
    sub-2^24-magnitude float32 planes (arithmetic-shift hi + masked lo
    reassemble exactly, negatives included) and every leaf flattens to
    >= 1-D before crossing. Host numpy leaves pass straight through."""
    from ..utils.dispatch import is_jax_array

    if not is_jax_array(v):
        return np.asarray(v)
    shape, dtype = v.shape, v.dtype
    if jnp.issubdtype(dtype, jnp.integer):
        if jnp.iinfo(dtype).bits <= 32:
            # two planes: |hi| < 2^20 and lo < 2^12 are exact in float32
            hi, lo = _split_i32_planes(v)
            out = np.asarray(hi).astype('int64') * 4096 + np.asarray(lo).astype(
                'int64'
            )
        else:
            # int64 (jax_enable_x64): three 20-bit planes keep every
            # plane's magnitude under 2^24 so float32 carries it exactly
            hi, mid, lo = _split_i64_planes(v)
            out = (
                np.asarray(hi).astype('int64') * (1 << 40)
                + np.asarray(mid).astype('int64') * (1 << 20)
                + np.asarray(lo).astype('int64')
            )
        return out.reshape(shape).astype(np.dtype(dtype.name))
    if jnp.issubdtype(dtype, jnp.complexfloating):
        if dtype != jnp.complex64:
            return np.asarray(v)
        re, im = _split_c64_planes(v)
        out = np.asarray(re) + 1j * np.asarray(im)
        return out.reshape(shape).astype('complex64')
    if jnp.issubdtype(dtype, jnp.floating) and dtype != jnp.float32:
        # float64 etc. take the direct path (exactness over axon-safety)
        return np.asarray(v)
    return np.asarray(_flat_f32(v)).reshape(shape).astype(np.dtype(dtype.name))


def _carry_path(path: str) -> str:
    """np.savez appends '.npz' when the suffix is missing; normalize so
    save and load agree on the path the caller recorded."""
    return path if str(path).endswith('.npz') else str(path) + '.npz'


def save_carry(path: str, carry) -> None:
    """checkpoint a streaming-reduction carry (any pytree of arrays) so a
    long capture analysis can resume after interruption — the only state
    worth checkpointing in this library (SURVEY.md §5: "nothing to resume;
    all transforms are stateless ... beyond streaming-reduction carry
    state"). Device leaves are read back through the axon-safe float32
    channel (_leaf_to_host), so checkpointing works mid-capture on the
    tunneled TPU."""
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    np.savez(
        _carry_path(path),
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f'leaf_{i}': _leaf_to_host(v) for i, v in enumerate(leaves)},
    )


def load_carry(path: str, like):
    """restore a carry checkpointed with save_carry. ``like`` provides the
    pytree structure (e.g. a fresh init_carry / PersistenceCarry); the
    stored structure must match it (leaf count + treedef), so a
    checkpoint from a different design fails loudly instead of mapping
    leaves onto the wrong fields."""
    import os

    if not os.path.exists(path):
        path = _carry_path(path)
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    n_stored = sum(1 for k in data.files if k.startswith('leaf_'))
    stored_treedef = (
        bytes(data['__treedef__']).decode()
        if '__treedef__' in data.files
        else None
    )
    if n_stored != len(leaves) or (
        stored_treedef is not None and stored_treedef != str(treedef)
    ):
        raise ValueError(
            f'checkpoint structure ({n_stored} leaves, '
            f'{stored_treedef!r}) does not match `like` '
            f'({len(leaves)} leaves, {str(treedef)!r})'
        )
    # mirror each `like` leaf's placement: host numpy leaves restore as
    # host numpy (jnp.asarray would silently wrap int64 to int32 with
    # jax_enable_x64 off); device leaves go back to the device
    from ..utils.dispatch import is_jax_array

    restored = [
        jnp.asarray(data[f'leaf_{i}'])
        if is_jax_array(leaf)
        else data[f'leaf_{i}']
        for i, leaf in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, restored)


# raw packed count tiles are exact-integer float32; flush them into the
# int32 histogram before any cell can reach 2**24 (half for margin)
_FLUSH_FRAMES = 1 << 23


class PersistenceCarry(NamedTuple):
    """sufficient statistics carried across chunks, per frequency bin.

    When the design enables the packed counting kernel
    (design['hist_raw_plan'] is not None), per-chunk counts accumulate
    in ``hist_raw`` — the kernel's raw quadrant tile layout, which adds
    elementwise — and ``hist`` holds only counts already flushed from
    it (persistence_flush). Extracting counts from the raw tiles costs
    ~2.5x the counting kernel itself (the diagonal gather), so it runs
    once at readout/flush instead of per chunk. ``hist_raw`` cells are
    exact integer-valued float32: flush at least every 2**23 frames
    (streaming_persistence_spectrum does so automatically; readout
    folds any pending raw counts in without mutating the carry)."""

    hist: jax.Array  # (nfreq, n_bins) dB histogram counts (flushed)
    psum: jax.Array  # (nfreq,) power sum
    pmax: jax.Array  # (nfreq,) max power
    pmin: jax.Array  # (nfreq,) min power
    count: jax.Array  # () frame count
    hist_raw: jax.Array = None  # packed raw count tiles (or None)


def _resolve_persistence_backend(
    nfft: int, *, chunk_samples: int = None, tpu: bool = None
) -> str:
    """fft_backend='auto' resolution for the persistence machinery: the
    fused Pallas spectrogram kernel when it covers nfft (and, if known,
    the chunk length) on a TPU target; else the factored MXU transform
    for composite sizes; else 'xla'. Never raises — unsupported designs
    quietly take the XLA path (an explicit backend request still errors
    loudly)."""
    if tpu is None:
        from ..ops.pallas._common import on_tpu_like

        tpu = on_tpu_like()
    if not tpu:
        return 'xla'
    from ..ops.pallas.spectrogram_pallas import spectrogram_pallas_supported

    if spectrogram_pallas_supported(nfft, 0) and (
        chunk_samples is None or chunk_samples % (1024 * 128) == 0
    ):
        return 'pallas'
    from ..ops.mxu_fft import plan_factors

    try:
        plan_factors(nfft)
        return 'mxu'
    except ValueError:
        return 'xla'


def design_persistence(
    *,
    nfft: int,
    window,
    dtype='complex64',
    hist_range_dB=(-150.0, 50.0),
    hist_bins: int = 1024,
    fft_backend: str = 'auto',
    fft_precision: str = 'auto',
) -> dict:
    """host-side design for the persistence fold (the repo's
    design-dict -> apply pattern): window, histogram edges, and — for
    the factored backends — the bin permutation.

    fft_backend:
        'auto'   (default) the fastest backend whose constraints hold
                 on this platform (_resolve_persistence_backend)
        'xla'    jnp.fft, natural bin order
        'mxu'    four-step DFT matmuls; every per-frequency statistic
                 stays in the transform's factored (k1, k2) bin order,
                 skipping its transposed readout (a full-spectrogram
                 lane shuffle per chunk); persistence_finalize
                 unscrambles the accumulated (nfft,)-shaped statistics
                 once, at readout
        'pallas' the fused VMEM-resident window->DFT->dB kernel
                 (ops/pallas/spectrogram_pallas.py), same factored
                 order; requires nfft = a*128 (a a power-of-two
                 divisor of 128) and chunk lengths in multiples of
                 131072 samples

    fft_precision ('pallas' backend only): 'highest' (f32 dots, ~3e-6
    relative of the dB spectrogram), 'high' (hi/lo bf16 3-pass,
    ~0.02 dB worst-case on low-power bins — below the default 0.2 dB
    histogram bin width), 'bf16' (~0.05 dB). 'auto' (default) resolves
    to 'high' — the production tier bench.py measures — when the
    pallas backend resolves on, 'highest' otherwise.
    """
    if fft_backend == 'auto' or fft_precision == 'auto':
        from ..ops.pallas._common import on_tpu_like

        _tpu = on_tpu_like()
        if fft_backend == 'auto':
            fft_backend = _resolve_persistence_backend(nfft, tpu=_tpu)
        if fft_precision == 'auto':
            # the 3-pass tier only pays off on the MXU; interpret-mode
            # (CPU) kernels keep full f32
            fft_precision = (
                'high' if (fft_backend == 'pallas' and _tpu) else 'highest'
            )
    if fft_backend not in ('xla', 'mxu', 'pallas'):
        raise ValueError("fft_backend must be 'xla', 'mxu' or 'pallas'")
    passes = {'highest': 6, 'high': 3, 'bf16': 1}.get(fft_precision)
    if passes is None:
        raise ValueError(
            "fft_precision must be 'highest', 'high' or 'bf16'"
        )
    if fft_backend != 'pallas' and fft_precision != 'highest':
        raise ValueError(
            f"fft_precision={fft_precision!r} only applies to "
            "fft_backend='pallas' (the xla/mxu paths always run f32 "
            'HIGHEST dots); drop the argument or switch backend'
        )
    if not (
        isinstance(window, str)
        or (isinstance(window, tuple) and window and isinstance(window[0], str))
    ):
        raise TypeError(
            'design_persistence takes a window name or (name, param) '
            'tuple (the design is host-cached by value)'
        )
    w = get_window(
        window, nfft, xp=np, dtype=np.dtype(dtype).name, norm=True,
        fftshift=True,
    )
    # hist_bins=0: stats-only fold (mean/max/min, no histogram and no
    # quantiles) — the per-frame histogram is the dominant fold cost
    # when only envelope statistics are wanted
    edges = None
    if hist_bins:
        edges = np.linspace(
            hist_range_dB[0], hist_range_dB[1], hist_bins + 1
        ).astype('float32')
    # packed-counter raw carry (see PersistenceCarry): engaged whenever
    # the fold would use the packed one-hot-matmul kernel — the pallas
    # backend always counts through it, and on a TPU target the unfused
    # paths dispatch to it too (columnwise_histogram_fast)
    hist_raw_plan = None
    if hist_bins and hist_bins <= 1024:
        from ..ops.pallas._common import on_tpu_like

        if fft_backend == 'pallas' or on_tpu_like():
            from ..ops.pallas.colhist_pallas import packed_plan

            hist_raw_plan = packed_plan(hist_bins, nfft)
    unscramble = None
    if fft_backend in ('mxu', 'pallas'):
        if fft_backend == 'pallas':
            from ..ops.pallas.spectrogram_pallas import (
                spectrogram_pallas_supported,
            )

            if not spectrogram_pallas_supported(nfft, 0):
                raise ValueError(
                    f"fft_backend='pallas' needs nfft = a*128 with a a "
                    f'power-of-two divisor of 128, not {nfft}'
                )
        # both factored backends share plan_factors' (a, b), so their
        # bin orders agree (the kernel asserts the same identity)
        from ..ops.mxu_fft import plan_factors

        a, b = plan_factors(nfft)
        flat = np.arange(nfft)
        unscramble = np.argsort((flat % b) * a + flat // b)
    return {
        'nfft': nfft,
        'window': w,
        'edges_dB': edges,
        'fft_backend': fft_backend,
        'fft_passes': passes,
        'unscramble': unscramble,
        'hist_raw_plan': hist_raw_plan,
        # resume-safety tag: carries accumulated under one design must
        # not continue under another (e.g. factored vs natural bin
        # order would silently corrupt every per-bin statistic)
        'fingerprint': (
            nfft,
            hist_bins,
            tuple(float(v) for v in hist_range_dB) if hist_bins else None,
            fft_backend,
            # precision changes the measurement function (up to ~0.05
            # dB between tiers) — carries must not mix tiers
            fft_precision if fft_backend == 'pallas' else 'highest',
            window,
        ),
    }


def persistence_init(design: dict) -> PersistenceCarry:
    """zeroed carry for persistence_fold."""
    nfft = design['nfft']
    if design['edges_dB'] is None:
        hist = None
    else:
        hist_bins = design['edges_dB'].shape[0] - 1
        hist = jnp.zeros((nfft, hist_bins), dtype=jnp.int32)
    plan = design.get('hist_raw_plan')
    return PersistenceCarry(
        hist=hist,
        psum=jnp.zeros((nfft,), dtype=jnp.float32),
        pmax=jnp.full((nfft,), -jnp.inf, dtype=jnp.float32),
        pmin=jnp.full((nfft,), jnp.inf, dtype=jnp.float32),
        count=jnp.zeros((), dtype=jnp.int32),
        hist_raw=(
            None
            if plan is None
            else jnp.zeros(plan['raw_shape'], dtype=jnp.float32)
        ),
    )


def persistence_flush(carry: PersistenceCarry, design: dict) -> PersistenceCarry:
    """fold the pending packed raw count tiles into the int32 histogram
    (no-op for designs without the raw representation). Traceable. Call
    at least every 2**23 accumulated frames to stay inside the raw
    tiles' exact-integer float32 range — streaming_persistence_spectrum
    does this automatically, and readout folds pending raw counts in
    without mutating the carry."""
    plan = design.get('hist_raw_plan')
    if plan is None or carry.hist_raw is None:
        return carry
    from ..ops.pallas.colhist_pallas import unpack_packed_counts

    return carry._replace(
        hist=carry.hist + unpack_packed_counts(carry.hist_raw, plan),
        hist_raw=jnp.zeros_like(carry.hist_raw),
    )


def _chunk_planes(chunk):
    """(xr, xi) float planes of a chunk given either as a complex array
    or as a (2, n) float plane stack (planes skip the complex
    materialization + deinterleave copies entirely)."""
    if chunk.ndim == 2 and chunk.shape[0] == 2 and not jnp.iscomplexobj(chunk):
        return chunk[0], chunk[1]
    flat = chunk.reshape(-1)
    return flat.real, flat.imag


def _chunk_complex(chunk):
    """complex view of a chunk given as complex or (2, n) planes."""
    if chunk.ndim == 2 and chunk.shape[0] == 2 and not jnp.iscomplexobj(chunk):
        return unpack_iq(chunk)
    return chunk


def _spectrogram_dB_chunk(chunk, design):
    """chunk -> (frames, nfft) dB spectrogram in the design's bin order."""
    nfft = design['nfft']
    if design['fft_backend'] == 'pallas':
        from ..ops.pallas.spectrogram_pallas import spectrogram_dB_pallas

        xr, xi = _chunk_planes(chunk)
        return spectrogram_dB_pallas(
            xr,
            xi,
            design['window'],
            nfft,
            passes=design['fft_passes'],
        )
    frames = _chunk_complex(chunk).reshape(-1, nfft)
    wind = (design['window'] / nfft).astype(frames.dtype)
    frames = frames * wind[None, :]
    if design['fft_backend'] == 'mxu':
        from ..ops.mxu_fft import four_step_factored

        D = four_step_factored(frames, nfft)  # (frames, a, b)
        spg = (D.real * D.real + D.imag * D.imag).reshape(-1, nfft)
    else:
        Y = jnp.fft.fft(frames, axis=1)
        spg = Y.real * Y.real + Y.imag * Y.imag
    return 10.0 * jnp.log10(spg + 1e-25)


def persistence_fold(carry: PersistenceCarry, chunk, design: dict):
    """accumulate one chunk of non-overlapping nfft frames into the
    persistence carry (traceable; ``design`` is static). ``chunk`` is a
    complex array or a (2, n) float plane stack (planes avoid the
    complex materialization on the pallas backend). Bin order of the
    carry is the design's internal order — always read results through
    persistence_finalize."""
    fused = _fused_levels_fold(carry, chunk, design)
    if fused is not None:
        return fused

    spg_dB = _spectrogram_dB_chunk(chunk, design)

    hist = carry.hist
    hist_raw = carry.hist_raw
    plan = design.get('hist_raw_plan')
    if design['edges_dB'] is None:
        pass
    elif plan is not None:
        # packed one-hot-matmul kernel, RAW tile accumulation: counts
        # extract once at flush/readout instead of per chunk (the
        # diagonal gather costs ~2.5x the counting kernel)
        from ..ops.pallas.colhist_pallas import (
            columnwise_histogram_packed_raw,
        )

        hist_raw = hist_raw + columnwise_histogram_packed_raw(
            spg_dB, design['edges_dB'], plan=plan
        )
    else:
        # one-hot-matmul kernel on TPU (~70x the XLA sort path), sort
        # elsewhere
        from ..ops.pallas.colhist_pallas import columnwise_histogram_fast

        hist = hist + columnwise_histogram_fast(
            spg_dB, design['edges_dB']
        )

    return PersistenceCarry(
        hist=hist,
        psum=carry.psum + spg_dB.sum(axis=0),
        pmax=jnp.maximum(carry.pmax, spg_dB.max(axis=0)),
        pmin=jnp.minimum(carry.pmin, spg_dB.min(axis=0)),
        count=carry.count + spg_dB.shape[0],
        hist_raw=hist_raw,
    )


def _fused_levels_fold(carry, chunk, design, apd_navg: int = 0):
    """pallas-backend fold through the fused spectrogram->levels+stats
    kernel (VERDICT r2 #2): the dB frames never round-trip through HBM —
    the kernel emits quantized histogram levels plus the per-bin
    sum/max/min accumulated in VMEM, and only the level indices feed the
    packed one-hot-matmul histogram. Returns None when the design/shape
    wants the unfused path (nfft < 1024, non-multiple chunk sizes, or
    bin counts beyond the packed kernel's on-chip validation cap —
    columnwise_histogram_fast's same 1024 limit).

    With apd_navg > 0 the kernel also emits the detector-binned raw
    power (the chunk is then read exactly once for the whole
    persistence+APD fold) and the return is (carry, p_binned).

    Stats-only designs (hist_bins=0) use the no-levels kernel variant:
    the accumulators are the only HBM writes."""
    if design['fft_backend'] != 'pallas':
        return None
    stats_only = design['edges_dB'] is None
    if not stats_only and design['edges_dB'].shape[0] - 1 > 1024:
        return None
    from ..ops.pallas.spectrogram_pallas import (
        spectrogram_levels_pallas,
        spectrogram_levels_supported,
    )

    xr, xi = _chunk_planes(chunk)
    if not spectrogram_levels_supported(design['nfft'], xr.shape[0]):
        return None

    outs = spectrogram_levels_pallas(
        xr,
        xi,
        design['window'],
        design['nfft'],
        design['edges_dB'],
        passes=design['fft_passes'],
        apd_navg=apd_navg,
    )
    n_frames = xr.shape[0] // design['nfft']
    hist = carry.hist
    hist_raw = carry.hist_raw
    if stats_only:
        psum, pmax, pmin = outs[:3]
        pbin_i = 3
    else:
        idx, psum, pmax, pmin = outs[:4]
        pbin_i = 4
        B = design['edges_dB'].shape[0] - 1
        plan = design.get('hist_raw_plan')
        if plan is not None:
            # raw tile accumulation; extraction deferred to flush/readout
            from ..ops.pallas.colhist_pallas import (
                columnwise_histogram_packed_raw,
            )

            hist_raw = hist_raw + columnwise_histogram_packed_raw(
                levels=(idx, B), plan=plan
            )
        else:
            from ..ops.pallas.colhist_pallas import (
                columnwise_histogram_packed,
            )

            hist = hist + columnwise_histogram_packed(levels=(idx, B))
    new_carry = PersistenceCarry(
        hist=hist,
        psum=carry.psum + psum,
        pmax=jnp.maximum(carry.pmax, pmax),
        pmin=jnp.minimum(carry.pmin, pmin),
        count=carry.count + n_frames,
        hist_raw=hist_raw,
    )
    if apd_navg:
        return new_carry, outs[pbin_i]
    return new_carry


def persistence_apd_fold(
    pcarry: PersistenceCarry,
    apd_counts,
    chunk,
    design: dict,
    *,
    apd_edges,
    apd_navg: int = 1,
    apd_kernel: str = 'auto',
):
    """persistence_fold + detector-binned apd_fold of one chunk in a
    SINGLE pass over the samples when the fused pallas path applies
    (the levels kernel emits the binned power alongside the histogram
    levels); otherwise composes the two folds. ``chunk`` may be complex
    or (2, n) float planes.

    Returns (new_pcarry, new_apd_counts).
    """
    from ..utils.dispatch import is_jax_array

    fused_ok = (
        apd_navg >= 1
        and 128 % apd_navg == 0
        and apd_kernel in ('auto', 'pallas')
        and not is_jax_array(apd_edges)
    )
    if fused_ok:
        fused = _fused_levels_fold(pcarry, chunk, design, apd_navg=apd_navg)
        if fused is not None:
            new_carry, p_binned = fused
            from ..ops.pallas.hist_pallas import histogram_edge_counts_pallas

            c = histogram_edge_counts_pallas(
                p_binned, np.asarray(apd_edges, dtype='float32')
            )
            return new_carry, apd_counts + c.astype(apd_counts.dtype)

    return (
        persistence_fold(pcarry, chunk, design),
        apd_fold(
            apd_counts, chunk, edges=apd_edges, navg=apd_navg,
            kernel=apd_kernel,
        ),
    )


import functools as _functools


@_functools.lru_cache(maxsize=64)
def _readout_program(fingerprint, quantiles):
    """jitted finalize readout, cached per design fingerprint so that
    periodic checkpoint readouts of a long capture compile once (a
    fresh closure per call would pay a remote compile every time on
    the tunneled backend)."""
    nfft, hist_bins, hist_range, fft_backend, fft_precision, window = (
        fingerprint
    )
    design = design_persistence(
        nfft=nfft,
        window=window,
        hist_range_dB=hist_range or (-150.0, 50.0),
        hist_bins=hist_bins,
        fft_backend=fft_backend,
        fft_precision=(
            fft_precision if fft_backend == 'pallas' else 'highest'
        ),
    )
    u = design['unscramble']
    edges = design['edges_dB']
    q = np.asarray(quantiles, dtype='float32')

    from .sharded import quantile_from_histogram

    @jax.jit
    def _readout(c):
        hist = c.hist
        if hist is not None and c.hist_raw is not None:
            # fold pending packed raw counts in (structure-derived plan:
            # the carry self-describes its representation, so a carry
            # saved on one platform reads out on any other)
            from ..ops.pallas.colhist_pallas import (
                packed_plan,
                unpack_packed_counts,
            )

            hist = hist + unpack_packed_counts(
                c.hist_raw, packed_plan(hist.shape[1], nfft)
            )
        if hist is not None and u is not None:
            hist = hist[u]
        psum = c.psum if u is None else c.psum[u]
        pmax = c.pmax if u is None else c.pmax[u]
        pmin = c.pmin if u is None else c.pmin[u]
        qs = (
            None
            if hist is None
            else quantile_from_histogram(hist, edges, jnp.asarray(q))
        )
        return hist, psum / c.count, pmax, pmin, qs

    return _readout


def persistence_finalize(
    carry: PersistenceCarry,
    design: dict,
    *,
    fs: float,
    quantiles=(0.5, 0.95, 0.99),
) -> dict:
    """reduce a persistence carry to the result dict (monotonic
    frequency order; applies the factored-order unscramble if the
    design uses the MXU transform)."""
    from ..ops.fft import fftfreq

    hist, mean_dB, pmax, pmin, qs = _readout_program(
        design['fingerprint'], tuple(float(v) for v in quantiles)
    )(carry)
    out = {
        'freqs': fftfreq(design['nfft'], 1.0 / fs, xp=np),
        'mean_dB': mean_dB,
        'max_dB': pmax,
        'min_dB': pmin,
    }
    if hist is not None:
        out['quantiles_dB'] = qs
        out['hist'] = hist
        out['hist_edges_dB'] = np.asarray(design['edges_dB'])
    return out


_PIPELINE_PROGRAMS: 'dict' = {}


def _fold_pipeline_program(
    design, *, n_samples, n_chunks, chunk, tail_keep, flush_every,
    want_chunks,
):
    """jitted slice -> reshape -> scan-fold -> tail-fold -> flush
    pipeline for streaming_persistence_spectrum, cached per static
    configuration. Every device op of the eager entrypoint must live
    inside one compiled program: the tunneled axon backend implements
    only jit execution — an eager reshape/slice raises UNIMPLEMENTED
    (the round-4 psd matrix config died on exactly that), and a fresh
    jit closure per call would pay a remote retrace each call.

    The program takes (x, init) where init=None materializes
    persistence_init's zeros in-jit; a resumed raw-tile carry is
    flushed up front (pending raw counts must fold into the int32
    histogram before any cell can approach 2**24). Returns
    (final_carry, x_chunks, tail): the reshaped chunks + device tail
    feed the exact-quantile re-scan without further eager ops, and are
    None/empty when want_chunks is False so the extra HBM copy is only
    paid when the refinement will run."""
    key = (
        # fingerprint omits the input dtype and the raw-plan presence;
        # the baked window dtype and a plan flag stand in for them (a
        # cached program closes over its whole design)
        design['fingerprint'], str(np.asarray(design['window']).dtype),
        design.get('hist_raw_plan') is not None,
        n_samples, n_chunks, chunk, tail_keep, flush_every, want_chunks,
    )
    prog = _PIPELINE_PROGRAMS.get(key)
    if prog is not None:
        return prog
    plan = design.get('hist_raw_plan')

    @jax.jit
    def _run(x, init):
        if init is None:
            init = persistence_init(design)
        elif plan is not None:
            init = persistence_flush(init, design)
        tail = x[n_chunks * chunk : n_chunks * chunk + tail_keep]
        xc = x[: n_chunks * chunk].reshape(n_chunks, chunk)
        if plan is None or n_chunks <= flush_every:
            final, _ = jax.lax.scan(
                lambda c, cx: (persistence_fold(c, cx, design), None),
                init, xc,
            )
        else:
            # raw-tile f32 counters are exact only to 2**24: flush into
            # the int32 histogram every flush_every chunks
            def _body(c, icx):
                i, cx = icx
                c = persistence_fold(c, cx, design)
                c = jax.lax.cond(
                    (i + 1) % flush_every == 0,
                    lambda cc: persistence_flush(cc, design),
                    lambda cc: cc,
                    c,
                )
                return c, None

            final, _ = jax.lax.scan(
                _body, init, (jnp.arange(n_chunks, dtype=jnp.int32), xc)
            )
        if tail_keep:
            final = persistence_fold(final, tail, design)
        if plan is not None:
            # hand downstream consumers (finalize, the exact-quantile
            # refinement, the returned resume carry) a flushed carry
            final = persistence_flush(final, design)
        if not want_chunks:
            return final, None, None
        return final, xc, (tail if tail_keep else None)

    if len(_PIPELINE_PROGRAMS) >= 64:
        _PIPELINE_PROGRAMS.pop(next(iter(_PIPELINE_PROGRAMS)))
    _PIPELINE_PROGRAMS[key] = _run
    return _run


def streaming_persistence_spectrum(
    x,
    *,
    fs: float,
    window,
    nfft: int,
    chunk_frames: int = 512,
    hist_range_dB=(-150.0, 50.0),
    hist_bins: int = 1024,
    quantiles=(0.5, 0.95, 0.99),
    fft_backend: str = 'auto',
    fft_precision: str = 'auto',
    init_carry: PersistenceCarry = None,
    exact_quantiles: bool = False,
):
    """persistence spectrum of a long capture via lax.scan chunking.

    Processes non-overlapping nfft frames in chunks of ``chunk_frames``,
    carrying per-frequency histograms + moments. Peak memory is one chunk's
    spectrogram regardless of capture length — the scan analogue of
    ops.spectral.power_spectral_density (fourier.py:1236-1327).

    fft_backend='mxu' runs the chunk transform as four-step DFT
    matmuls in factored bin order; fft_backend='pallas' (with
    fft_precision='high') is the fused-kernel configuration bench.py's
    1 GS streaming benchmark measures — it additionally requires
    chunk_frames*nfft to be a multiple of 131072 samples (see
    design_persistence).

    ``init_carry`` resumes accumulation from a prior run: pass the
    previous call's RESULT DICT (preferred — its design fingerprint is
    validated, since a carry accumulated under a different design, e.g.
    the other fft_backend's bin order, would silently corrupt every
    per-bin statistic), or a bare PersistenceCarry from
    save_carry/load_carry (no validation possible; the caller owns
    design consistency).

    ``exact_quantiles=True`` runs a SECOND scan of the capture that
    replaces the histogram-inverted 'quantiles_dB' (accuracy = bin
    width) with EXACT order statistics matching jnp.quantile bit for
    bit (_refine_quantiles_exact): pass 1's histogram brackets each
    quantile to a bin, pass 2 keeps only bracketed values. Requires
    hist_bins > 0 and no init_carry (the resumed carry's earlier
    samples are not available to re-scan).

    Returns:
        dict with 'freqs', 'mean_dB', 'max_dB', 'min_dB',
        'quantiles_dB' of shape (len(quantiles), nfreq), 'hist',
        'hist_edges_dB', and '_carry'/'_design' (pass the dict back as
        init_carry).
    """
    x = jnp.asarray(x)
    chunk = chunk_frames * nfft
    if fft_backend == 'auto':
        # resolve with the chunk length in hand so 'auto' never trips
        # the pallas chunk-multiple requirement below
        fft_backend = _resolve_persistence_backend(nfft, chunk_samples=chunk)
    if fft_backend == 'pallas' and chunk % (1024 * 128):
        raise ValueError(
            f"fft_backend='pallas' needs chunk_frames*nfft "
            f'({chunk}) to be a multiple of 131072; adjust chunk_frames'
        )
    n_chunks = x.shape[0] // chunk
    if n_chunks == 0:
        raise ValueError(f'capture shorter than one chunk ({chunk} samples)')

    # fold whole trailing frames beyond the last full chunk rather than
    # silently dropping up to chunk-1 samples; the pallas kernels need
    # 131072-sample slabs, so that backend keeps only slab multiples
    tail_keep = (x.shape[0] - n_chunks * chunk) // nfft * nfft
    if fft_backend == 'pallas':
        tail_keep -= tail_keep % (1024 * 128)
    dropped = x.shape[0] - n_chunks * chunk - tail_keep
    if dropped >= nfft:
        import warnings

        warnings.warn(
            f'dropping {dropped} trailing samples '
            f'(shorter than one {"pallas slab" if fft_backend == "pallas" else "frame"})'
        )
    design = design_persistence(
        nfft=nfft,
        window=window,
        dtype=np.dtype(x.dtype).name,
        hist_range_dB=hist_range_dB,
        hist_bins=hist_bins,
        fft_backend=fft_backend,
        fft_precision=fft_precision,
    )
    if init_carry is None:
        init = None  # persistence_init runs inside the jitted pipeline
    elif isinstance(init_carry, dict):
        if init_carry.get('_design') != design['fingerprint']:
            raise ValueError(
                'init_carry was accumulated under a different design '
                f"({init_carry.get('_design')} != {design['fingerprint']}); "
                'resuming would mix incompatible bin orders/ranges'
            )
        init = init_carry['_carry']
    else:
        init = init_carry

    flush_every = max(1, _FLUSH_FRAMES // chunk_frames)
    want_chunks = bool(
        exact_quantiles
        and quantiles
        and hist_bins > 0
        and init_carry is None
        and not isinstance(x, jax.core.Tracer)
    )
    prog = _fold_pipeline_program(
        design,
        n_samples=int(x.shape[0]),
        n_chunks=n_chunks,
        chunk=chunk,
        tail_keep=tail_keep,
        flush_every=flush_every,
        want_chunks=want_chunks,
    )
    final, x_chunks, tail = prog(x, init)

    out = persistence_finalize(final, design, fs=fs, quantiles=quantiles)
    out['_carry'] = final
    out['_design'] = design['fingerprint']

    if exact_quantiles:
        if isinstance(x, jax.core.Tracer):
            raise ValueError(
                'exact_quantiles=True runs a host-orchestrated multi-pass '
                'refinement (bracket planning reads device results '
                'between passes) and cannot execute under jit/vmap/grad. '
                'Call outside jit — the folds inside are jitted — or use '
                'the histogram quantiles from the base result.'
            )
        if hist_bins == 0:
            raise ValueError(
                'exact_quantiles needs the histogram pass (hist_bins > 0) '
                'to bracket the order statistics'
            )
        if init_carry is not None:
            raise ValueError(
                'exact_quantiles cannot refine a resumed carry: the '
                "earlier capture's samples are not available to re-scan"
            )
        refined = _refine_quantiles_exact(
            x_chunks, tail, design, final, quantiles
        )
        if refined is not None:
            out['quantiles_dB'] = refined
            out['quantiles_exact'] = True
    return out


_C_DIRECT = 2048  # coarse-bracket capacity above which the sub-histogram
_B_SUB = 1024  # narrowing pass runs first (sub-bins per coarse bracket)


def _columnwise_int_counts(idx, n_bins: int):
    """per-column counts of integer labels 0..n_bins-1 (label n_bins is
    the excluded sentinel): idx (rows, cols) int32 -> (cols, n_bins)
    int32. Sort + binary search, never scatter-add (the TPU histogram
    rule, parallel/sharded.py:547)."""
    s = jnp.sort(idx, axis=0)
    bounds = jnp.arange(n_bins + 1, dtype=idx.dtype)
    cum = jax.vmap(
        lambda col: jnp.searchsorted(col, bounds, side='left'), in_axes=1
    )(s)
    return jnp.diff(cum, axis=1).astype(jnp.int32)


def _bracket_plan(hist_nat, edges, n, qs, pmin_nat, pmax_nat):
    """host-side bracketing of each quantile's two order statistics
    (stage A of the exact refinement, shared by the streaming and the
    sharded variants). ``hist_nat`` (F, B) may carry the packed
    counters' +-1-bin edge-tie slack; brackets absorb it with one extra
    bin per side and the exact per-frequency min/max clamp them finite.

    Returns a dict: low/high/hw (nq,) jnp.quantile 'linear' rank
    arithmetic in float32; lo/hi (nq, F) float32 value brackets;
    cap (nq, F) int64 in-bracket count bound.
    """
    F, B = hist_nat.shape
    # jnp.quantile('linear') rank arithmetic, replicated in float32:
    # pos = q*(n-1); low = floor(pos); high = ceil(pos);
    # result = v_low*(1-g) + v_high*g with g = pos - low
    q32 = np.asarray(qs, dtype=np.float32)
    pos = q32 * np.float32(n - 1)
    low_f = np.floor(pos)
    high_f = np.ceil(pos)
    hw = (pos - low_f).astype(np.float32)
    low = np.clip(low_f, 0, n - 1).astype(np.int64)  # (nq,)
    high = np.clip(high_f, 0, n - 1).astype(np.int64)

    cum = hist_nat.cumsum(axis=1)  # (F, B)

    def bin_of(r):
        # counted bin of 0-indexed rank r: first b with cum[b] >= r+1
        return (cum[None, :, :] < (r[:, None, None] + 1)).sum(axis=2)

    # bracket: bins of both order statistics, +-1 bin of tie slack
    b_lo = np.clip(np.minimum(bin_of(low), bin_of(high)) - 1, 0, B - 1)
    b_hi = np.clip(bin_of(high) + 1, 0, B - 1)
    # end bins are clipped catch-alls; the exact per-frequency min/max
    # make every bracket finite. pmin/pmax come from the FOLD pass; the
    # collect pass recomputes the spectrogram in a differently-fused
    # compiled body whose values legally drift a few ulps, and the
    # in-bracket test is half-open [lo, hi) — so pad several ulps below
    # pmin and above pmax or the column extremes fall out of their own
    # bracket (caught by the round-5 fuzz sweep: a max exactly 1 ulp
    # above pmax landed ON the old nextafter(pmax) clamp and the strict
    # < excluded it). Ulp-scale padding is harmless: the clamps only
    # need to keep brackets finite, and the capacity bound comes from
    # the bin counts, not the clamps.
    lo_nat = np.where(b_lo == 0, -np.inf, edges[b_lo]).astype('float32')
    hi_nat = np.where(b_hi == B - 1, np.inf, edges[b_hi + 1]).astype(
        'float32'
    )
    pad_lo = (
        pmin_nat - 32 * np.spacing(np.abs(pmin_nat), dtype=np.float32)
    ).astype('float32')
    pad_hi = (
        pmax_nat + 32 * np.spacing(np.abs(pmax_nat), dtype=np.float32)
    ).astype('float32')
    lo_nat = np.maximum(lo_nat, pad_lo[None, :]).astype('float32')
    hi_nat = np.minimum(hi_nat, pad_hi[None, :]).astype('float32')
    # capacity: a true-in-bracket sample was counted within one bin of
    # its true bin, so pass-1 counts over [b_lo-1, b_hi+1] bound the
    # true in-bracket count
    csum = np.concatenate([np.zeros((F, 1), np.int64), cum], axis=1)
    f_idx = np.arange(F)[None, :]
    cap = (
        csum[f_idx, np.clip(b_hi + 1, 0, B - 1) + 1]
        - csum[f_idx, np.clip(b_lo - 1, 0, B - 1)]
    )
    return {
        'low': low, 'high': high, 'hw': hw,
        'lo': lo_nat, 'hi': hi_nat, 'cap': cap,
    }


def _bracket_invw(lo_nat, hi_nat):
    """host-side inverse sub-bin width of each finite bracket."""
    width = np.maximum(
        np.asarray(hi_nat) - np.asarray(lo_nat), np.float32(1e-30)
    )
    return (np.float32(_B_SUB) / width).astype('float32')


def _sub_idx_map(spg, lo, hi, invw):
    """the sub-bin integer map idx = floor((v - lo) * invw), shared by
    the narrowing and collect passes (and by the streaming and sharded
    refiners) so membership is decided by IDENTICAL integer compares;
    monotone in v, so order statistics land in cumulative-count order
    even if the float map is not perfectly uniform. Out-of-bracket
    values get the sentinel _B_SUB.

    (frames, F) -> (nq, frames, F) int32 sub-bin labels. The bracket
    arrays are RUNTIME ARGUMENTS, never closure captures: a captured
    device array embeds as an HLO constant, so every call with fresh
    bracket values would lower (and remote-compile) a brand-new
    program — the round-5 finding that made the eager exact-quantile
    path pay ~12 s/call through the tunnel."""
    in1 = (spg[None] >= lo[:, None, :]) & (spg[None] < hi[:, None, :])
    t = (spg[None] - lo[:, None, :]) * invw[:, None, :]
    idx = jnp.clip(jnp.floor(t), 0, _B_SUB - 1).astype(jnp.int32)
    return jnp.where(in1, idx, jnp.int32(_B_SUB))


def _sub_idx_fn(lo_j, hi_j, invw_j):
    """closure form of :func:`_sub_idx_map` for callers already inside
    a single jit trace (the sharded refiner), where capture is free."""

    def sub_idx(spg):
        return _sub_idx_map(spg, lo_j, hi_j, invw_j)

    return sub_idx


def _narrow_brackets(sub_h, below2, low, high):
    """locate each target rank's sub-bin from the narrowing pass's OWN
    exact counts (below2 and sub_h come from the same spectrogram
    values, so they are mutually consistent); +-1 sub-bin slack absorbs
    last-ulp spectrogram drift vs the collect pass's compiled body.
    Returns (b2_lo, b2_hi, C) with C the rounded-up collect capacity."""
    cums2 = sub_h.cumsum(axis=2)  # (nq, F, B_SUB)
    r2_lo = low[:, None] - below2
    r2_hi = high[:, None] - below2
    if (r2_lo < 0).any() or (r2_hi >= cums2[..., -1]).any():
        raise RuntimeError(
            'exact-quantile coarse bracket missed its order '
            "statistic — the pass-1 histogram and the narrowing "
            "pass's recount disagree by more than the one-bin tie "
            'slack; re-run with quantile refinement disabled and '
            'report this capture'
        )

    def sub_bin_of(r):
        # first sub-bin with cumulative count >= r+1
        return (cums2 < (r[..., None] + 1)).sum(axis=2)

    b2_lo = np.clip(sub_bin_of(r2_lo) - 1, 0, _B_SUB - 1)
    b2_hi = np.clip(sub_bin_of(r2_hi) + 1, 0, _B_SUB - 1)
    # capacity: collect-pass values drift < 1 sub-bin from the
    # narrowing counts, so counts over [b2_lo-1, b2_hi+1] bound the
    # collected in-bracket total
    nq, F = below2.shape
    csum2 = np.concatenate(
        [np.zeros((nq, F, 1), np.int64), cums2], axis=2
    )
    cap2 = (
        np.take_along_axis(
            csum2,
            np.clip(b2_hi + 1, 0, _B_SUB - 1)[..., None] + 1,
            axis=2,
        )[..., 0]
        - np.take_along_axis(
            csum2, np.clip(b2_lo - 1, 0, _B_SUB - 1)[..., None], axis=2
        )[..., 0]
    )
    C = max(-(-int(cap2.max()) // 8) * 8, 8)
    return b2_lo, b2_hi, C


def _gather_order_stats(buf_h, below_h, low, high, hw):
    """stage E of the exact refinement: rank each target within the
    collected buffer (exact below-bracket recounts), gather the two
    order statistics, and interpolate by DELEGATING to jnp.quantile on
    the two gathered values — quantile g of [v_lo, v_hi] evaluates the
    IDENTICAL compiled expression (weight g*(2-1) = g), so the result
    is bit-exact with jnp.quantile of the full column (re-deriving the
    v_lo*(1-g) + v_hi*g arithmetic by hand differed by one ulp wherever
    XLA contracted the mul+add differently). Returns (nq, F) f32."""
    nq = buf_h.shape[0]
    in_bracket = np.isfinite(buf_h).sum(axis=1)  # (nq, F)
    r_lo = low[:, None] - below_h
    r_hi = high[:, None] - below_h
    if (r_lo < 0).any() or (r_hi >= in_bracket).any():
        raise RuntimeError(
            'exact-quantile bracket missed its order statistic — the '
            "bracketing passes and the collect pass's recount disagree "
            'by more than the tie slack; re-run with quantile '
            'refinement disabled and report this capture'
        )
    v_lo = np.take_along_axis(
        buf_h, r_lo[:, None, :].astype(np.int64), axis=1
    )[:, 0]
    v_hi = np.take_along_axis(
        buf_h, r_hi[:, None, :].astype(np.int64), axis=1
    )[:, 0]
    rows = [
        jnp.quantile(
            jnp.asarray(np.stack([v_lo[qi], v_hi[qi]])),
            jnp.float32(hw[qi]),
            axis=0,
        )
        for qi in range(nq)
    ]
    return np.stack([_leaf_to_host(r) for r in rows]).astype(np.float32)


def _refine_quantiles_exact(x_chunks, tail, design, carry, quantiles):
    """EXACT per-frequency quantiles of a chunked capture via bracketed
    re-scans (VERDICT r3 #4).

    Pass 1 (the caller's persistence fold) histogrammed every dB value;
    the histogram brackets each requested quantile's two order
    statistics to a bin per frequency, expanded by one bin on each side
    to absorb the packed counters' edge-tie one-bin slack, and clamped
    finite by the carry's exact per-frequency min/max. The final pass
    streams the capture again keeping ONLY in-bracket values: per chunk,
    out-of-bracket values map to +inf and a per-column sort keeps the
    smallest C entries, where the capacity C bounds the total in-bracket
    count — so no needed order statistic is ever dropped. The count of
    values strictly below each bracket is re-counted exactly alongside,
    giving each quantile's rank within the buffer, and the final
    interpolation replicates jnp.quantile's 'linear' float32 arithmetic
    bit for bit (reference counterpart: xp.quantile in the one-shot
    stack, fourier.py:1320 — which cannot stream at all).

    The in-bracket count grows linearly with capture length (fixed bin
    width), which would make the per-chunk buffer sort quadratic in
    capture length; when the coarse capacity exceeds _C_DIRECT a
    NARROWING pass runs first: each coarse bracket is split into _B_SUB
    sub-bins by the integer map floor((v - lo) * B/(hi - lo)) and
    counted exactly per frequency, shrinking the final bracket (and C)
    by ~_B_SUB/3 so the collect buffer stays O(1) in capture length. A
    +-1 sub-bin slack absorbs last-ulp drift of the re-computed
    spectrogram between differently-fused scan bodies; ranks never rely
    on it (they come from the collect scan's own exact recount).

    Cost: one or two extra scans of the capture (the spectrogram
    transform re-runs) plus per-column sorts — vs the bin-width-limited
    single-pass estimate, this trades re-scans for exactness at any
    capture length.

    Returns (nq, nfft) float32 exact quantiles in natural bin order.
    """
    qs = [float(v) for v in quantiles]
    if not qs:
        return None
    hist = _leaf_to_host(carry.hist).astype(np.int64)  # (nfft, B) design order
    n = int(np.asarray(_leaf_to_host(carry.count)).reshape(-1)[0])
    edges = np.asarray(design['edges_dB'], dtype='float32')
    nfft, B = hist.shape
    u = design['unscramble']
    hist_nat = hist if u is None else hist[u]
    pmin_d = _leaf_to_host(carry.pmin).astype('float32')
    pmax_d = _leaf_to_host(carry.pmax).astype('float32')
    pmin_nat = pmin_d if u is None else pmin_d[u]
    pmax_nat = pmax_d if u is None else pmax_d[u]

    plan = _bracket_plan(hist_nat, edges, n, qs, pmin_nat, pmax_nat)
    low, high, hw = plan['low'], plan['high'], plan['hw']
    lo_nat, hi_nat, cap = plan['lo'], plan['hi'], plan['cap']
    nq = len(qs)

    # bracket arrays in the design's (possibly factored) bin order so
    # the folds index the transform output directly
    def to_design(a_nat):
        if u is None:
            return a_nat
        a_d = np.empty_like(a_nat)
        a_d[:, u] = a_nat
        return a_d

    # bracket arrays stay HOST numpy here and cross to the device as
    # jit ARGUMENTS of module-cached programs: a fresh jit closure per
    # call would retrace, and captured device brackets would embed as
    # HLO constants — both force a remote re-compile per call through
    # the tunnel (measured at ~12 s/call before this was fixed)
    lo_d, hi_d = to_design(lo_nat), to_design(hi_nat)
    invw_d = _bracket_invw(lo_d, hi_d)
    tail_len = 0 if tail is None else int(tail.shape[0])
    chunks_shape = tuple(int(v) for v in x_chunks.shape)

    if int(cap.max()) > _C_DIRECT:
        # ---- narrowing pass: exact sub-bin + below-bracket counts ----
        narrow = _narrow_program(
            design, nq=nq, nfft=nfft, chunks_shape=chunks_shape,
            tail_len=tail_len,
        )
        sub_c = narrow(x_chunks, tail, lo_d, hi_d, invw_d)
        sub_h = _leaf_to_host(sub_c[0]).astype(np.int64)  # (nq, nfft, B2)
        below2 = _leaf_to_host(sub_c[1]).astype(np.int64)  # (nq, nfft)

        b2_lo, b2_hi, C = _narrow_brackets(sub_h, below2, low, high)
        b2_lo = b2_lo.astype(np.int32)
        b2_hi = b2_hi.astype(np.int32)
    else:
        # coarse bracket small enough to collect directly: the fine
        # bracket degenerates to the whole sub-bin range
        C = max(-(-int(cap.max()) // 8) * 8, 8)
        b2_lo = np.zeros((nq, nfft), np.int32)
        b2_hi = np.full((nq, nfft), _B_SUB - 1, np.int32)

    # ---- collect pass: smallest-C in-bracket values + exact ranks ----
    collect = _collect_program(
        design, nq=nq, nfft=nfft, C=C, chunks_shape=chunks_shape,
        tail_len=tail_len,
    )
    buf, below = collect(x_chunks, tail, lo_d, hi_d, invw_d, b2_lo, b2_hi)

    buf_h = _leaf_to_host(buf)  # (nq, C, nfft)
    below_h = _leaf_to_host(below).astype(np.int64)  # exact recount
    vals_d = _gather_order_stats(buf_h, below_h, low, high, hw)
    return vals_d if u is None else vals_d[:, u]


def _narrow_program(design, *, nq, nfft, chunks_shape, tail_len):
    """module-cached jitted narrowing pass (see _sub_idx_map's note on
    why brackets are arguments): (x_chunks, tail, lo, hi, invw) ->
    (sub-bin counts (nq, nfft, _B_SUB), below-bracket counts)."""
    key = (
        'narrow', design['fingerprint'],
        str(np.asarray(design['window']).dtype),
        design.get('hist_raw_plan') is not None,
        nq, nfft, chunks_shape, tail_len,
    )
    prog = _PIPELINE_PROGRAMS.get(key)
    if prog is not None:
        return prog

    def fold_sub(carry2, chunk, lo, hi, invw):
        subhist, below2 = carry2
        spg = _spectrogram_dB_chunk(chunk, design)  # (frames, nfft)
        idx = _sub_idx_map(spg, lo, hi, invw)
        counts = jax.vmap(
            lambda ix: _columnwise_int_counts(ix, _B_SUB)
        )(idx)  # (nq, nfft, B_SUB)
        below2 = below2 + (spg[None] < lo[:, None, :]).sum(
            axis=1, dtype=jnp.int32
        )
        return subhist + counts, below2

    @jax.jit
    def _run(xs, tail, lo, hi, invw):
        init = (
            jnp.zeros((nq, nfft, _B_SUB), jnp.int32),
            jnp.zeros((nq, nfft), jnp.int32),
        )
        c, _ = jax.lax.scan(
            lambda cc, cx: (fold_sub(cc, cx, lo, hi, invw), None), init, xs
        )
        if tail_len:
            c = fold_sub(c, tail, lo, hi, invw)
        return c

    if len(_PIPELINE_PROGRAMS) >= 64:
        _PIPELINE_PROGRAMS.pop(next(iter(_PIPELINE_PROGRAMS)))
    _PIPELINE_PROGRAMS[key] = _run
    return _run


def _collect_program(design, *, nq, nfft, C, chunks_shape, tail_len):
    """module-cached jitted collect pass: keep the smallest C
    in-bracket values per (quantile, frequency) plus the exact
    below-bracket recount. Brackets are runtime arguments (see
    _sub_idx_map)."""
    key = (
        'collect', design['fingerprint'],
        str(np.asarray(design['window']).dtype),
        design.get('hist_raw_plan') is not None,
        nq, nfft, C, chunks_shape, tail_len,
    )
    prog = _PIPELINE_PROGRAMS.get(key)
    if prog is not None:
        return prog

    def fold(carry2, chunk, lo, hi, invw, b2_lo, b2_hi):
        buf, below = carry2
        spg = _spectrogram_dB_chunk(chunk, design)  # (frames, nfft)
        idx = _sub_idx_map(spg, lo, hi, invw)  # sentinel _B_SUB outside
        keep = (idx >= b2_lo[:, None, :]) & (idx <= b2_hi[:, None, :])
        cand = jnp.where(keep, spg[None], jnp.inf)
        below = below + (
            (spg[None] < lo[:, None, :]) | (idx < b2_lo[:, None, :])
        ).sum(axis=1, dtype=jnp.int32)
        # the C smallest of a union always lie within (the C smallest of
        # the prefix) ∪ (the new chunk), so per-chunk truncation to the
        # C smallest streams the selection losslessly for every rank < C
        buf = jnp.sort(jnp.concatenate([buf, cand], axis=1), axis=1)[:, :C]
        return buf, below

    @jax.jit
    def _run(xs, tail, lo, hi, invw, b2_lo, b2_hi):
        init = (
            jnp.full((nq, C, nfft), jnp.inf, jnp.float32),
            jnp.zeros((nq, nfft), jnp.int32),
        )
        out, _ = jax.lax.scan(
            lambda cc, cx: (fold(cc, cx, lo, hi, invw, b2_lo, b2_hi), None),
            init, xs,
        )
        if tail_len:
            out = fold(out, tail, lo, hi, invw, b2_lo, b2_hi)
        return out

    if len(_PIPELINE_PROGRAMS) >= 64:
        _PIPELINE_PROGRAMS.pop(next(iter(_PIPELINE_PROGRAMS)))
    _PIPELINE_PROGRAMS[key] = _run
    return _run


def apd_fold(counts, chunk, *, edges, navg: int = 1, kernel: str = 'auto'):
    """accumulate one chunk's amplitude-power-distribution counts
    (traceable). ``edges`` may be host numpy or a jax array; the Pallas
    kernel path needs host numpy (edges embed into the kernel as
    constants).

    navg > 1 bins power by a detector period first (mean over navg
    consecutive samples — the reference CCDF workflow, figures.py:
    827-836, as an MXU matmul) so arbitrarily long captures count in
    ~1/navg the time; the chunk length must then be a navg multiple
    (detector windows never span chunk boundaries). kernel: 'auto'
    uses the Pallas edge-compare histogram on TPU targets (host-numpy
    edges only) and the sort path elsewhere; 'sort' and 'pallas' force
    a path.
    """
    from ..utils.dispatch import is_jax_array

    if chunk.ndim == 1 and not jnp.iscomplexobj(chunk):
        # already a real power series (sample_ccdf semantics): bin as-is
        p = chunk
    else:
        xr, xi = _chunk_planes(chunk)
        p = xr * xr + xi * xi
    if navg > 1:
        from ..ops.power import binned_mean_matmul

        if p.shape[0] % navg:
            raise ValueError(
                f'chunk length {p.shape[0]} must be a multiple of '
                f'navg={navg} (a detector window cannot span chunks)'
            )
        p = binned_mean_matmul(p, navg)

    if kernel == 'auto':
        from ..ops.pallas._common import on_tpu_like

        kernel = (
            'pallas' if on_tpu_like() and not is_jax_array(edges) else 'sort'
        )
    if kernel == 'pallas':
        if is_jax_array(edges):
            raise TypeError(
                "kernel='pallas' needs host numpy edges (they embed "
                'into the kernel as constants)'
            )
        from ..ops.pallas.hist_pallas import histogram_edge_counts_pallas

        c = histogram_edge_counts_pallas(p, edges)
    else:
        from ..ops.power import histogram_edge_counts

        c = histogram_edge_counts(
            p, edges if is_jax_array(edges) else jnp.asarray(edges)
        )
    return counts + c.astype(counts.dtype)


def streaming_apd(
    x,
    *,
    edges,
    chunk_size: int = 1 << 20,
    navg: int = 1,
    kernel: str = 'auto',
):
    """amplitude-power-distribution counts of a long capture via lax.scan.

    Fixed-memory counterpart of ops.power.sample_ccdf
    (power_analysis.py:552-580). Use sharded.ccdf_from_counts to
    convert. See apd_fold for navg (detector-binned APD; chunk_size
    must be a navg multiple and trailing samples short of a detector
    window are dropped) and kernel. ``x`` may be 1-D complex or (2, n)
    float [real, imag] planes (the io.read_iq_planes layout).

    Counts accumulate in device int32: exact up to 2^31-1 binned
    samples per bin, which no array that fits in device memory can
    exceed (a 2^31-sample complex capture is ~17 GB). Captures beyond
    one array — the disk-chunked workflows — should roll apd_fold
    results into a host int64 between chunks; see
    examples/disk_to_chip.py.
    """
    from ..utils.dispatch import is_jax_array

    x = jnp.asarray(x)
    planes = x.ndim == 2 and x.shape[0] == 2 and not jnp.iscomplexobj(x)
    if x.ndim != 1 and not planes:
        raise ValueError(
            'x must be 1-D (complex or power) or (2, n) float planes, '
            f'not shape {x.shape} dtype {x.dtype}'
        )
    if chunk_size < 1:
        raise ValueError(f'chunk_size must be a positive integer, not {chunk_size}')
    if navg > 1 and chunk_size % navg:
        raise ValueError(
            f'chunk_size={chunk_size} must be a multiple of navg={navg}'
        )
    if not is_jax_array(edges):
        edges = np.asarray(edges, dtype='float32')
    n_edges = edges.shape[0]
    n = x.shape[1] if planes else x.shape[0]
    n_chunks = n // chunk_size
    if planes:
        tail = x[:, n_chunks * chunk_size :]
        if navg > 1:
            tail = tail[:, : (tail.shape[1] // navg) * navg]
        tail_n = tail.shape[1]
        body = x[:, : n_chunks * chunk_size]

        def chunk_at(i):
            # dynamic_slice instead of a (2, n_chunks, chunk) transpose:
            # the planes stay in place, each scan step reads its window
            return jax.lax.dynamic_slice(
                body, (0, i * chunk_size), (2, chunk_size)
            )

    else:
        tail = x[n_chunks * chunk_size :]
        if navg > 1:
            tail = tail[: (tail.shape[0] // navg) * navg]
        tail_n = tail.shape[0]
        body2d = x[: n_chunks * chunk_size].reshape(n_chunks, chunk_size)

        def chunk_at(i):
            return body2d[i]

    def count_at(counts, i):
        return apd_fold(
            counts, chunk_at(i), edges=edges, navg=navg, kernel=kernel
        ), None

    def scan_range(lo, hi):
        counts, _ = jax.lax.scan(
            count_at, init, jnp.arange(lo, hi, dtype=jnp.int32)
        )
        return counts

    init = jnp.zeros((n_edges + 1,), dtype=jnp.int32)

    # int32 accumulator guard: unreachable for any array that fits in
    # device memory, but fail loudly rather than wrap silently
    if (n_chunks * chunk_size + tail_n) // max(navg, 1) >= (1 << 31):
        raise ValueError(
            'binned sample count exceeds the int32 accumulator; count '
            'in segments with apd_fold and roll into a host int64'
        )

    counts = scan_range(0, n_chunks) if n_chunks else init
    if tail_n:
        counts = apd_fold(
            counts, tail, edges=edges, navg=navg, kernel=kernel
        )
    return counts
