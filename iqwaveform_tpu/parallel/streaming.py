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

__all__ = [
    'PersistenceCarry',
    'load_carry',
    'save_carry',
    'streaming_apd',
    'streaming_persistence_spectrum',
]


def save_carry(path: str, carry) -> None:
    """checkpoint a streaming-reduction carry (any pytree of arrays) so a
    long capture analysis can resume after interruption — the only state
    worth checkpointing in this library (SURVEY.md §5: "nothing to resume;
    all transforms are stateless ... beyond streaming-reduction carry
    state")."""
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f'leaf_{i}': np.asarray(v) for i, v in enumerate(leaves)},
    )


def load_carry(path: str, like):
    """restore a carry checkpointed with save_carry. ``like`` provides the
    pytree structure (e.g. a fresh init_carry / PersistenceCarry)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    restored = [
        jnp.asarray(data[f'leaf_{i}']) for i in range(len(leaves))
    ]
    return jax.tree_util.tree_unflatten(treedef, restored)


class PersistenceCarry(NamedTuple):
    """sufficient statistics carried across chunks, per frequency bin."""

    hist: jax.Array  # (nfreq, n_bins) dB histogram counts
    psum: jax.Array  # (nfreq,) power sum
    pmax: jax.Array  # (nfreq,) max power
    pmin: jax.Array  # (nfreq,) min power
    count: jax.Array  # () frame count


def _spectrogram_chunk(chunk, w, nfft):
    frames = chunk.reshape(-1, nfft)
    wind = (w / nfft).astype(frames.dtype)
    Y = jnp.fft.fft(frames * wind[None, :], axis=1)
    return Y.real * Y.real + Y.imag * Y.imag


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
):
    """persistence spectrum of a long capture via lax.scan chunking.

    Processes non-overlapping nfft frames in chunks of ``chunk_frames``,
    carrying per-frequency histograms + moments. Peak memory is one chunk's
    spectrogram regardless of capture length — the scan analogue of
    ops.spectral.power_spectral_density (fourier.py:1236-1327).

    Returns:
        dict with 'freqs', 'mean_dB', 'max_dB', 'min_dB', and
        'quantiles_dB' of shape (len(quantiles), nfreq)
    """
    from ..ops.fft import fftfreq
    from .sharded import quantile_from_histogram

    x = jnp.asarray(x)
    chunk = chunk_frames * nfft
    n_chunks = x.shape[0] // chunk
    if n_chunks == 0:
        raise ValueError(f'capture shorter than one chunk ({chunk} samples)')
    x = x[: n_chunks * chunk].reshape(n_chunks, chunk)

    w = get_window(
        window, nfft, xp=np, dtype=np.dtype(x.dtype).name, norm=True, fftshift=True
    )
    edges = np.linspace(hist_range_dB[0], hist_range_dB[1], hist_bins + 1).astype('float32')

    init = PersistenceCarry(
        hist=jnp.zeros((nfft, hist_bins), dtype=jnp.int32),
        psum=jnp.zeros((nfft,), dtype=jnp.float32),
        pmax=jnp.full((nfft,), -jnp.inf, dtype=jnp.float32),
        pmin=jnp.full((nfft,), jnp.inf, dtype=jnp.float32),
        count=jnp.zeros((), dtype=jnp.int32),
    )

    # one-hot-matmul kernel on TPU (6x the sort path), XLA sort elsewhere
    from ..ops.pallas.colhist_pallas import columnwise_histogram_fast

    def step(carry, chunk_x):
        spg = _spectrogram_chunk(chunk_x, w, nfft)  # (frames, nfft)
        spg_dB = 10.0 * jnp.log10(spg + 1e-25)

        hist = carry.hist + columnwise_histogram_fast(spg_dB, edges)

        return (
            PersistenceCarry(
                hist=hist,
                psum=carry.psum + spg_dB.sum(axis=0),
                pmax=jnp.maximum(carry.pmax, spg_dB.max(axis=0)),
                pmin=jnp.minimum(carry.pmin, spg_dB.min(axis=0)),
                count=carry.count + spg_dB.shape[0],
            ),
            None,
        )

    final, _ = jax.lax.scan(step, init, x)

    qs = quantile_from_histogram(final.hist, edges, jnp.asarray(quantiles))

    return {
        'freqs': fftfreq(nfft, 1.0 / fs, xp=np),
        'mean_dB': final.psum / final.count,
        'max_dB': final.pmax,
        'min_dB': final.pmin,
        'quantiles_dB': qs,
        'hist': final.hist,
        'hist_edges_dB': np.asarray(edges),
    }


def streaming_apd(
    x,
    *,
    edges,
    chunk_size: int = 1 << 20,
):
    """amplitude-power-distribution counts of a long capture via lax.scan.

    Fixed-memory counterpart of ops.power.sample_ccdf
    (power_analysis.py:552-580): per-chunk searchsorted + scatter-add into
    a carried counts vector. Use sharded.ccdf_from_counts to convert.
    """
    x = jnp.asarray(x)
    edges = jnp.asarray(edges)
    n_chunks = x.shape[0] // chunk_size
    tail = x[n_chunks * chunk_size :]
    body = x[: n_chunks * chunk_size].reshape(n_chunks, chunk_size)

    from ..ops.power import histogram_edge_counts

    def count_chunk(counts, chunk_x):
        p = chunk_x.real * chunk_x.real + chunk_x.imag * chunk_x.imag
        return counts + histogram_edge_counts(p, edges).astype(counts.dtype), None

    init = jnp.zeros((edges.shape[0] + 1,), dtype=jnp.int32)
    counts, _ = jax.lax.scan(count_chunk, init, body)

    if tail.shape[0]:
        counts, _ = count_chunk(counts, tail)

    return counts
