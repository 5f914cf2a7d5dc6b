"""Time-axis-sharded STFT / spectrogram / OLA pipelines with halo exchange.

TPU-native scale-out of the fourier subsystem (SURVEY.md §5, §7 step 5):

* The capture is sharded along time across the mesh. STFT framing on each
  device needs only the first ``noverlap`` samples of its right neighbor —
  one cheap ``ppermute`` over ICI (the DSP analogue of context-parallel
  halo exchange).
* ISTFT overlap-add produces ``noverlap`` tail samples that belong to the
  right neighbor's head — the reverse ppermute + add.
* Reductions (detector stats, APD histograms, persistence quantiles) merge
  with psum/pmax/pmin, giving exact global statistics; quantiles use exact
  all-gather along frames when feasible and fixed-bin histogram inversion
  (see parallel.streaming) at scale.

Frame bookkeeping: with hop = nperseg - noverlap and shard size S (a
multiple of hop), every device computes exactly S/hop frames — frames that
start in its shard. The global tail (final noverlap samples) is treated as
zero-padded, i.e. 'extend' semantics (reference fourier.py:1132 extend=True),
so shapes stay uniform across devices.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops import power as power_analysis
from ..ops.filtering import (
    _find_downsample_copy_range,
    _freq_band_edges,
    _ola_filter_parameters,
)
from ..ops.stft import _window_dtype_like
from ..ops.window_design import equivalent_noise_bandwidth, get_window
from .mesh import TIME_AXIS, Mesh

__all__ = [
    'ccdf_from_counts',
    'columnwise_histogram',
    'quantile_from_histogram',
    'sharded_apd_histogram',
    'sharded_channelize_power',
    'sharded_ola_filter',
    'sharded_psd_stats',
    'sharded_spectrogram',
    'sharded_stft',
]


def _check_shard_covers_halo(shard_size: int, noverlap: int):
    """the halo exchange reaches only the immediate right neighbor, so a
    per-device shard shorter than noverlap cannot supply its neighbor's
    overlap window — fail loudly instead of framing past the halo."""
    if noverlap > shard_size:
        raise ValueError(
            f'per-device shard size ({shard_size}) must be at least '
            f'noverlap ({noverlap}); use fewer devices or a longer capture'
        )


def _right_halo(x_local, halo: int, axis_name):
    """receive the first ``halo`` samples of the right neighbor's shard
    (zeros on the last device). axis_name=None -> single device: zero halo
    ('extend' semantics at the capture end)."""
    head = x_local[..., :halo]
    if axis_name is None:
        return jnp.zeros_like(head)

    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    # send my head to my left neighbor: (i -> i-1)
    perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    received = jax.lax.ppermute(head, axis_name, perm)
    # last device has no right neighbor: zero halo ('extend' semantics)
    return jnp.where(idx == n_dev - 1, jnp.zeros_like(received), received)


def _local_frames(x_ext, nperseg: int, hop: int, n_frames: int):
    """frames starting at 0, hop, ... within the halo-extended local shard."""
    if nperseg % hop == 0:
        R = nperseg // hop
        M = x_ext.shape[0] // hop
        blocks = x_ext[: M * hop].reshape(M, hop)
        rows = (np.arange(n_frames)[:, None] + np.arange(R)[None, :]).reshape(-1)
        return jnp.take(blocks, rows, axis=0).reshape(n_frames, nperseg)
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(nperseg)[None, :]).reshape(-1)
    return jnp.take(x_ext, idx, axis=0).reshape(n_frames, nperseg)


def _sharded_stft_local(x_local, *, w, nperseg, noverlap, norm, axis_name):
    """per-device STFT body (runs inside shard_map)."""
    hop = nperseg - noverlap
    S = x_local.shape[0]
    assert S % hop == 0, 'shard size must be a multiple of hop'
    n_frames = S // hop

    if noverlap > 0:
        halo = _right_halo(x_local, noverlap, axis_name)
        x_ext = jnp.concatenate([x_local, halo])
    else:
        x_ext = x_local

    frames = _local_frames(x_ext, nperseg, hop, n_frames)

    # scaling matches ops.stft: window/nfft, then for norm=None overlapped
    # framing divide by the COLA sum of |window/nfft| at hop strides —
    # which cancels the 1/nfft (fourier.py:571-580,1019)
    if norm is None and noverlap > 0:
        wind = w / jnp.abs(w[::hop]).sum()
    else:
        wind = w / nperseg
    # keep a complex baked-fftshift ramp intact for real inputs
    # (ops.stft._window_dtype_like semantics, docs/PARITY.md)
    wind = _window_dtype_like(wind, frames, jnp)
    return jnp.fft.fft(frames * wind[None, :], axis=1)


def sharded_stft(
    x,
    *,
    mesh: Mesh,
    window,
    nperseg: int,
    noverlap: int = 0,
    norm: Optional[str] = None,
    axis_name: str = TIME_AXIS,
):
    """STFT of a time-sharded 1-D capture.

    Input: x sharded (or shardable) along time with shard size a multiple
    of hop. Output: frames sharded along the frame axis, P(axis_name).
    Tail frames overlapping the capture end use zero padding.
    """
    if norm not in ('power', None):
        raise TypeError('norm must be "power" or None')
    hop = nperseg - noverlap
    n_dev = mesh.shape[axis_name]
    if x.shape[0] % (n_dev * hop):
        raise ValueError(
            f'capture size {x.shape[0]} must be a multiple of '
            f'n_devices*hop = {n_dev * hop}'
        )
    _check_shard_covers_halo(x.shape[0] // n_dev, noverlap)

    w = get_window(
        window,
        nperseg,
        xp=np,
        dtype=np.dtype(x.dtype).name,
        norm=(norm == 'power'),
        fftshift=True,
    )

    fn = jax.shard_map(
        functools.partial(
            _sharded_stft_local,
            w=w,
            nperseg=nperseg,
            noverlap=noverlap,
            norm=norm,
            axis_name=axis_name,
        ),
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(axis_name),
    )
    return fn(x)


def sharded_spectrogram(
    x,
    *,
    mesh: Mesh,
    window,
    nperseg: int,
    noverlap: int = 0,
    axis_name: str = TIME_AXIS,
):
    """power spectrogram of a time-sharded capture (norm='power'),
    frames sharded along time."""
    Y = sharded_stft(
        x,
        mesh=mesh,
        window=window,
        nperseg=nperseg,
        noverlap=noverlap,
        norm='power',
        axis_name=axis_name,
    )
    return power_analysis.envtopow(Y)


def sharded_channelize_power(
    x,
    *,
    mesh: Mesh,
    Ts: float,
    fft_size_per_channel: int,
    analysis_bins_per_channel: int = None,
    window='hann',
    fft_overlap_per_channel: int = 0,
    channel_count: int = 1,
    axis_name: str = TIME_AXIS,
):
    """per-channel power time series of a time-sharded capture — the
    sharded counterpart of ops.spectral.channelize_power (reference
    fourier.py:1330-1415; SURVEY.md §2 'batch sharding over channels for
    the channelizer'), accepting the full single-device signature.

    Frames shard along time (each chip channelizes its own shard; the
    channel reshape + power sum are frame-local, so the only collective
    is the O(noverlap) STFT halo ppermute when
    ``fft_overlap_per_channel > 0``).

    Returns:
        (frames, channel_count) power time series sharded along frames
    """
    if analysis_bins_per_channel is None:
        analysis_bins_per_channel = fft_size_per_channel
    if analysis_bins_per_channel > fft_size_per_channel:
        raise ValueError('the number of analysis bins cannot be greater than FFT size')

    nperseg = fft_size_per_channel * channel_count
    spg = sharded_spectrogram(
        x,
        mesh=mesh,
        window=window,
        nperseg=nperseg,
        noverlap=fft_overlap_per_channel * channel_count,
        axis_name=axis_name,
    )

    skip = channel_count * (fft_size_per_channel - analysis_bins_per_channel)
    if skip % 2 == 1:
        raise ValueError('must pass an even number of bins to skip')
    if skip:
        spg = spg[:, skip // 2 : spg.shape[1] - skip // 2]

    per_channel = spg.reshape(
        spg.shape[0], channel_count, analysis_bins_per_channel
    )
    return per_channel.sum(axis=2)


def _sharded_ola_body(
    x_local,
    *,
    w_in,
    w_shift_out,
    nfft,
    nfft_out,
    noverlap_in,
    noverlap_out,
    bounds_in,
    bounds_out,
    zero_lo,
    zero_hi,
    axis_name,
    fft_fn=jnp.fft.fft,
    ifft_fn=jnp.fft.ifft,
    fused_fn=None,
    fused_raw_fn=None,
    input_scale: float = 1.0,
):
    """stft -> zero passband -> frequency trim/pad -> istft, all local
    except the two noverlap-sized ppermutes.

    ``input_scale`` records the raw-sample scale the caller folded into
    ``fused_raw_fn``'s analysis window, so the XLA twin that replaces
    the Pallas kernel under differentiation (grad_fallback) reproduces
    the same output scale.

    Frames stay *group-separated* end to end when shapes allow: group g
    holds frames starting at offsets (g + k*R)*hop, which are (a)
    non-overlapping, so each group is a plain contiguous reshape of the
    shifted input (no gather), and (b) adjacent in the output, so each
    group's IFFT result concatenates contiguously into the overlap-add
    buffer (no re-grouping). The reference interleaves frames at STFT and
    re-groups at ISTFT (fourier.py:545-581, 630-647); keeping the grouped
    layout throughout removes both shuffles.
    """
    hop_in = nfft - noverlap_in
    hop_out = nfft_out - noverlap_out
    S = x_local.shape[0]
    n_frames = S // hop_in
    R_in = nfft // hop_in if noverlap_in > 0 else 1
    R_out = nfft_out // hop_out

    grouped = (
        noverlap_in > 0
        and n_frames % R_in == 0
        and R_in == R_out
        and nfft % hop_in == 0
        and nfft_out % hop_out == 0
    )

    def spectral_transform(Y):
        """zero passband + frequency resample, per frame batch."""
        if zero_lo > 0:
            Y = Y.at[:, :zero_lo].set(0)
        if zero_hi is not None and zero_hi < nfft:
            Y = Y.at[:, zero_hi:].set(0)

        # downsample_stft semantics (fourier.py:866-924) in BOTH
        # directions: copy the passband-centered source window into the
        # centered destination window, zero-fill the rest (the upsample
        # case must re-center an off-center passband too)
        if nfft_out != nfft:
            ysel = Y[:, bounds_in[0] : bounds_in[1]]
            if tuple(bounds_out) == (0, nfft_out):
                Y = ysel
            else:
                Y = jnp.zeros(Y.shape[:1] + (nfft_out,), dtype=Y.dtype)
                Y = Y.at[:, bounds_out[0] : bounds_out[1]].set(ysel)
        return Y

    wind = (w_in / jnp.abs(w_in[::hop_in]).sum()).astype(x_local.dtype)

    if noverlap_in > 0:
        halo = _right_halo(x_local, noverlap_in, axis_name)
        x_ext = jnp.concatenate([x_local, halo])
    else:
        x_ext = x_local

    S_out = n_frames * hop_out
    out_len = S_out + noverlap_out

    if grouped:
        # gather-free path: R contiguous shifted reshapes in, R contiguous
        # slice-adds out
        M = n_frames // R_in
        group_adds = []
        for g in range(R_in):
            frames_g = jax.lax.dynamic_slice(
                x_ext, (g * hop_in,), (M * nfft,)
            ).reshape(M, nfft)
            if fused_raw_fn is not None:
                # VMEM-resident pallas kernel with both windows folded in
                # (ops.pallas.fused_ola_pallas); under differentiation the
                # XLA einsum twin runs instead (the kernel has no JVP rule)
                if fused_fn is not None:
                    from ..ops.pallas._common import grad_fallback

                    def _twin(fg):
                        y = fused_fn(fg * wind[None, :]) * w_shift_out[None, :]
                        return y * input_scale if input_scale != 1.0 else y

                    xg = grad_fallback(fused_raw_fn, _twin)(frames_g)
                else:
                    xg = fused_raw_fn(frames_g)
            elif fused_fn is not None:
                # transpose-free fft->zero->trim->ifft in factored
                # coordinates (ops.mxu_fft.fused_ola_mxu)
                xg = fused_fn(frames_g * wind[None, :]) * w_shift_out[None, :]
            else:
                Yg = fft_fn(frames_g * wind[None, :], axis=1)
                Yg = spectral_transform(Yg)
                xg = ifft_fn(Yg, axis=1) * w_shift_out[None, :]
            flat = xg.reshape(-1)  # group frames are output-contiguous
            start = g * hop_out
            length = min(flat.shape[0], out_len - start)
            group_adds.append((start, flat[:length]))

        # allocate with the IFFT result dtype: a real input still produces
        # a complex stream, and a float buffer would silently drop the
        # imaginary part in the scatter-add
        xr = jnp.zeros((out_len,), dtype=group_adds[0][1].dtype)
        for start, flat in group_adds:
            xr = xr.at[start : start + flat.shape[0]].add(flat)
    else:
        frames = _local_frames(x_ext, nfft, hop_in, n_frames)
        Y = fft_fn(frames * wind[None, :], axis=1)
        Y = spectral_transform(Y)
        xstack = ifft_fn(Y, axis=1) * w_shift_out[None, :]

        xr = jnp.zeros((out_len,), dtype=xstack.dtype)
        for offs in range(R_out):
            group = xstack[offs::R_out].reshape(-1)
            start = offs * hop_out
            length = min(group.shape[0], out_len - start)
            xr = xr.at[start : start + length].add(group[:length])

    # --- boundary exchange: my tail adds into right neighbor's head ---
    if noverlap_out > 0 and axis_name is not None:
        n_dev = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        tail = xr[S_out:]
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        incoming = jax.lax.ppermute(tail, axis_name, perm)
        incoming = jnp.where(idx == 0, jnp.zeros_like(incoming), incoming)
        xr = xr[:S_out].at[:noverlap_out].add(incoming)
    else:
        xr = xr[:S_out]

    return xr


def sharded_ola_filter(
    x,
    *,
    mesh: Mesh,
    fs: float,
    nfft: int,
    window='hamming',
    passband=(None, None),
    nfft_out: Optional[int] = None,
    axis_name: str = TIME_AXIS,
    fft_backend: str = 'xla',
):
    """bandpass + rational resample of a time-sharded capture via STFT
    overlap-add (the sharded counterpart of ops.filtering.ola_filter;
    reference fourier.py:1107-1181 scaled across ICI).

    The full pipeline — frame gather, window multiply, batched FFT, bin
    zeroing, frequency trim, inverse FFT, grouped overlap-add — runs inside
    one shard_map, so each chip touches only its own S-sample shard plus
    two noverlap-sized halo messages.
    """
    nfft_out, noverlap_out, overlap_scale, _ = _ola_filter_parameters(
        int(x.size), window=window, nfft_out=nfft_out, nfft=nfft, extend=True
    )
    noverlap_in = round(nfft * overlap_scale)
    hop_in = nfft - noverlap_in

    n_dev = mesh.shape[axis_name]
    if x.shape[0] % (n_dev * hop_in):
        raise ValueError(
            f'capture size {x.shape[0]} must be a multiple of '
            f'n_devices*hop = {n_dev * hop_in}'
        )
    _check_shard_covers_halo(x.shape[0] // n_dev, noverlap_in)

    dtype_name = np.dtype(x.dtype).name
    w_in = get_window(window, nfft, xp=np, dtype=dtype_name, fftshift=True)
    w_shift_out = get_window(
        'rect', nfft_out, xp=np, dtype=dtype_name, fftshift=True
    )

    # static passband bin bounds (host design math)
    enbw = float(equivalent_noise_bandwidth(window, nfft_out, fftbins=False))
    pb_lo = None if passband[0] is None else passband[0] + enbw
    pb_hi = None if passband[1] is None else passband[1] - enbw
    zero_lo, zero_hi = _freq_band_edges(nfft, 1.0 / fs, pb_lo, pb_hi)
    zero_lo = 0 if zero_lo is None else zero_lo

    pb_start, pb_end = _freq_band_edges(nfft, 1.0 / fs, *passband)
    bounds_out, bounds_in, _ = _find_downsample_copy_range(
        nfft, nfft_out, pb_start, pb_end
    )

    if fft_backend == 'mxu':
        from ..ops.mxu_fft import fft_mxu, fused_ola_mxu, fused_ola_supported, ifft_mxu

        fft_fn, ifft_fn = fft_mxu, ifft_mxu
        fused_fn = None
        if nfft_out != nfft and fused_ola_supported(
            nfft, nfft_out, bounds_in, bounds_out
        ):
            fused_fn = functools.partial(
                fused_ola_mxu,
                nfft=nfft,
                nfft_out=nfft_out,
                zero_lo=zero_lo,
                zero_hi=zero_hi,
                bounds_in=bounds_in,
                bounds_out=bounds_out,
            )
    elif fft_backend == 'xla':
        fft_fn, ifft_fn, fused_fn = jnp.fft.fft, jnp.fft.ifft, None
    else:
        raise ValueError(f"fft_backend must be 'xla' or 'mxu', not {fft_backend!r}")

    fn = jax.shard_map(
        functools.partial(
            _sharded_ola_body,
            w_in=w_in,
            w_shift_out=w_shift_out,
            nfft=nfft,
            nfft_out=nfft_out,
            noverlap_in=noverlap_in,
            noverlap_out=noverlap_out,
            bounds_in=bounds_in,
            bounds_out=bounds_out,
            zero_lo=zero_lo,
            zero_hi=zero_hi,
            axis_name=axis_name,
            fft_fn=fft_fn,
            ifft_fn=ifft_fn,
            fused_fn=fused_fn,
        ),
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(axis_name),
    )
    return fn(x)


def _psd_stats_body(x_local, *, w, nperseg, noverlap, statistics, edges_dB, axis_name):
    spg = _sharded_stft_local(
        x_local,
        w=w,
        nperseg=nperseg,
        noverlap=noverlap,
        norm='power',
        axis_name=axis_name,
    )
    spg = spg.real * spg.real + spg.imag * spg.imag
    spg_dB = 10.0 * jnp.log10(spg + 1e-25)

    outs = []
    for stat in statistics:
        if stat == 'mean':
            outs.append(jax.lax.pmean(spg_dB.mean(axis=0), axis_name))
        elif stat in ('max', 'peak'):
            outs.append(jax.lax.pmax(spg_dB.max(axis=0), axis_name))
        elif stat == 'min':
            outs.append(jax.lax.pmin(spg_dB.min(axis=0), axis_name))
        elif stat == 'rms':
            # reference detector semantics: 'rms' of a POWER quantity is
            # its mean (power_analysis.py:73-101; ops/power.py
            # stat_ufunc_from_shorthand maps 'rms' -> mean)
            outs.append(jax.lax.pmean(spg_dB.mean(axis=0), axis_name))
        else:
            raise ValueError(f'unsupported sharded statistic {stat!r}')
    if outs:
        stats_out = jnp.stack(outs, axis=0)
    else:
        stats_out = jnp.zeros((0, spg_dB.shape[1]), dtype=spg_dB.dtype)

    # per-frequency histogram for quantile inversion at scale (one-hot
    # matmul kernel on TPU, sort path elsewhere)
    from ..ops.pallas.colhist_pallas import columnwise_histogram_fast

    hist = columnwise_histogram_fast(spg_dB, edges_dB)
    hist = jax.lax.psum(hist, axis_name)

    return stats_out, hist


def columnwise_histogram(vals, edges):
    """clipped per-column histogram: vals (rows, cols) -> (cols, n_bins)
    int32 counts with bin b covering [e_b, e_{b+1}) and out-of-range values
    clipped into the end bins.

    TPU-native: per-column sort + binary search of the edges instead of a
    scatter-add (TPU scatter serializes on colliding indices; the sorted
    formulation is ~30x faster at multi-M element counts).
    """
    n_rows = vals.shape[0]
    s = jnp.sort(vals, axis=0)  # sort each column

    # cum[c, k] = #{v in column c: v < e_k}
    cum = jax.vmap(
        lambda col: jnp.searchsorted(col, jnp.asarray(edges), side='left'),
        in_axes=1,
    )(s)

    counts = jnp.diff(cum, axis=1)  # (cols, n_bins)
    counts = counts.at[:, 0].add(cum[:, 0])  # clip-low: v < e_0
    counts = counts.at[:, -1].add(n_rows - cum[:, -1])  # clip-high: v >= e_last
    return counts.astype(jnp.int32)


def _exact_q_collect_body(
    x_local,
    *,
    w,
    nperseg,
    noverlap,
    axis_name,
    lo,
    hi,
    invw,
    b2_lo,
    b2_hi,
    C,
):
    """pass-2 shard body of the sharded exact-quantile refinement:
    re-compute the local spectrogram (the same expression as
    _psd_stats_body), keep each shard's C smallest in-bracket values,
    then merge losslessly across shards — each shard's local in-bracket
    count is bounded by the GLOBAL capacity C, so the all-gathered union
    contains every value the global top-C needs. Below-bracket counts
    psum exactly, giving each quantile's rank within the merged buffer.

    Collectives: one psum of (nq, F) int32 + one all-gather of
    (nq, C, F) float32 — C is O(1) after narrowing, so the gather is
    small and explicitly opt-in (this body only runs for
    exact_quantiles=True)."""
    from .streaming import _sub_idx_fn

    spg = _sharded_stft_local(
        x_local, w=w, nperseg=nperseg, noverlap=noverlap, norm='power',
        axis_name=axis_name,
    )
    spg = spg.real * spg.real + spg.imag * spg.imag
    spg_dB = 10.0 * jnp.log10(spg + 1e-25)

    lo_j, hi_j, invw_j = jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(invw)
    b2_lo_j = jnp.asarray(b2_lo)
    b2_hi_j = jnp.asarray(b2_hi)
    idx = _sub_idx_fn(lo_j, hi_j, invw_j)(spg_dB)
    keep = (idx >= b2_lo_j[:, None, :]) & (idx <= b2_hi_j[:, None, :])
    cand = jnp.where(keep, spg_dB[None], jnp.inf)
    below_local = (
        (spg_dB[None] < lo_j[:, None, :]) | (idx < b2_lo_j[:, None, :])
    ).sum(axis=1, dtype=jnp.int32)
    buf_local = jnp.sort(cand, axis=1)[:, :C]  # (nq, C, F)
    if buf_local.shape[1] < C:  # fewer local frames than C
        padding = jnp.full(
            (buf_local.shape[0], C - buf_local.shape[1], buf_local.shape[2]),
            jnp.inf,
            jnp.float32,
        )
        buf_local = jnp.concatenate([buf_local, padding], axis=1)

    below = jax.lax.psum(below_local, axis_name)
    bufs = jax.lax.all_gather(buf_local, axis_name)  # (n_dev, nq, C, F)
    merged = jnp.moveaxis(bufs, 0, 1).reshape(
        bufs.shape[1], -1, bufs.shape[3]
    )
    buf = jnp.sort(merged, axis=1)[:, :C]
    return buf, below


def _exact_q_subhist_body(
    x_local, *, w, nperseg, noverlap, axis_name, lo, hi, invw
):
    """narrowing shard body: exact global sub-bin + below-bracket
    counts (psum-merged)."""
    from .streaming import _B_SUB, _columnwise_int_counts, _sub_idx_fn

    spg = _sharded_stft_local(
        x_local, w=w, nperseg=nperseg, noverlap=noverlap, norm='power',
        axis_name=axis_name,
    )
    spg = spg.real * spg.real + spg.imag * spg.imag
    spg_dB = 10.0 * jnp.log10(spg + 1e-25)

    lo_j, hi_j, invw_j = jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(invw)
    idx = _sub_idx_fn(lo_j, hi_j, invw_j)(spg_dB)
    counts = jax.vmap(lambda ix: _columnwise_int_counts(ix, _B_SUB))(idx)
    below2 = (spg_dB[None] < lo_j[:, None, :]).sum(axis=1, dtype=jnp.int32)
    return (
        jax.lax.psum(counts, axis_name),
        jax.lax.psum(below2, axis_name),
    )


def _sharded_exact_quantiles(
    x,
    *,
    mesh,
    axis_name,
    w,
    nperseg,
    noverlap,
    qs,
    hist,
    pmin,
    pmax,
    edges_dB,
):
    """EXACT per-frequency quantiles of a time-sharded capture: the
    sharded counterpart of the streaming two-pass refinement
    (parallel/streaming.py _refine_quantiles_exact), matching
    jnp.quantile of the full gathered spectrogram bit for bit while
    only ever gathering O(C) values per frequency across the mesh.
    Pass 1's psum-merged histogram brackets each order statistic; a
    psum-merged sub-histogram narrowing pass runs when the coarse
    capacity is large; the collect pass all-gathers the per-shard top-C
    buffers. The reference's exact path (xp.quantile, fourier.py:1320)
    requires the whole spectrogram on one device."""
    from .streaming import (
        _bracket_invw,
        _bracket_plan,
        _C_DIRECT,
        _gather_order_stats,
        _leaf_to_host,
        _narrow_brackets,
    )

    hist_h = _leaf_to_host(hist).astype(np.int64)  # (F, B)
    n = int(hist_h[0].sum())  # totals are exact per frequency
    pmin_h = _leaf_to_host(pmin).astype('float32')
    pmax_h = _leaf_to_host(pmax).astype('float32')
    plan = _bracket_plan(
        hist_h, np.asarray(edges_dB, 'float32'), n, qs, pmin_h, pmax_h
    )
    lo, hi, cap = plan['lo'], plan['hi'], plan['cap']
    invw = _bracket_invw(lo, hi)
    nq, F = lo.shape

    from .streaming import _B_SUB

    if int(cap.max()) > _C_DIRECT:
        sub_fn = jax.shard_map(
            functools.partial(
                _exact_q_subhist_body,
                w=w, nperseg=nperseg, noverlap=noverlap,
                axis_name=axis_name, lo=lo, hi=hi, invw=invw,
            ),
            mesh=mesh,
            in_specs=P(axis_name),
            out_specs=(P(), P()),
        )
        sub_h_d, below2_d = sub_fn(x)
        sub_h = _leaf_to_host(sub_h_d).astype(np.int64)
        below2 = _leaf_to_host(below2_d).astype(np.int64)
        b2_lo, b2_hi, C = _narrow_brackets(
            sub_h, below2, plan['low'], plan['high']
        )
        b2_lo = b2_lo.astype(np.int32)
        b2_hi = b2_hi.astype(np.int32)
    else:
        C = max(-(-int(cap.max()) // 8) * 8, 8)
        b2_lo = np.zeros((nq, F), np.int32)
        b2_hi = np.full((nq, F), _B_SUB - 1, np.int32)

    collect_fn = jax.shard_map(
        functools.partial(
            _exact_q_collect_body,
            w=w, nperseg=nperseg, noverlap=noverlap, axis_name=axis_name,
            lo=lo, hi=hi, invw=invw, b2_lo=b2_lo, b2_hi=b2_hi, C=C,
        ),
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=(P(), P()),
        # buf is all-gathered + locally reduced, so it IS replicated in
        # value, but the varying-axes inference cannot see through the
        # gather+sort composition
        check_vma=False,
    )
    buf, below = collect_fn(x)
    buf_h = _leaf_to_host(buf)
    below_h = _leaf_to_host(below).astype(np.int64)
    return _gather_order_stats(
        buf_h, below_h, plan['low'], plan['high'], plan['hw']
    )


def sharded_psd_stats(
    x,
    *,
    mesh: Mesh,
    fs: float,
    window,
    nperseg: int,
    noverlap: int = 0,
    statistics=('mean', 'max', 'min'),
    hist_range_dB=(-150.0, 50.0),
    hist_bins: int = 2048,
    axis_name: str = TIME_AXIS,
    exact_quantiles: bool = False,
):
    """persistence-spectrum statistics of a time-sharded capture.

    Accepts the single-device ``power_spectral_density`` statistics
    convention (ops/spectral.py:46, reference fourier.py:1236-1327): named
    detectors ('mean', 'max'/'peak', 'min', 'rms') reduce exactly with
    pmean/pmax/pmin, and float entries are quantiles — computed at scale
    from a psum-merged per-frequency dB histogram (resolution =
    hist range / hist_bins) instead of the exact sort, the
    streaming-scale replacement per SURVEY.md §7d.

    ``exact_quantiles=True`` replaces the histogram-inverted quantiles
    with EXACT order statistics matching jnp.quantile of the full
    gathered spectrogram bit for bit, via the sharded two-pass
    refinement (_sharded_exact_quantiles): the histogram brackets each
    order statistic, shards re-scan their local frames keeping only
    bracketed values, and the tiny per-shard buffers merge with one
    all-gather — the reference's exact path (fourier.py:1320) needs the
    whole spectrogram on one device.

    Returns:
        (stats, hist, edges_dB): stats[i] is statistics[i] per frequency
        bin (replicated); hist is the (nfreq, hist_bins) global histogram
        for further quantile queries via `quantile_from_histogram`.
    """
    hop = nperseg - noverlap
    n_dev = mesh.shape[axis_name]
    if x.shape[0] % (n_dev * hop):
        raise ValueError('capture size must be a multiple of n_devices*hop')

    from ..utils import find_float_inds

    statistics = tuple(statistics)
    isquantile = find_float_inds(statistics)
    named = tuple(s for s, is_q in zip(statistics, isquantile) if not is_q)
    quantiles = [float(s) for s, is_q in zip(statistics, isquantile) if is_q]

    w = get_window(
        window,
        nperseg,
        xp=np,
        dtype=np.dtype(x.dtype).name,
        norm=True,
        fftshift=True,
    )
    edges_dB = np.linspace(hist_range_dB[0], hist_range_dB[1], hist_bins + 1).astype('float32')

    # the exact refinement needs the global per-frequency dB min/max to
    # clamp its brackets finite; compute them in the same pass
    named_internal = named
    if exact_quantiles and quantiles:
        named_internal = named + ('max', 'min')
    fn = jax.shard_map(
        functools.partial(
            _psd_stats_body,
            w=w,
            nperseg=nperseg,
            noverlap=noverlap,
            statistics=named_internal,
            edges_dB=edges_dB,
            axis_name=axis_name,
        ),
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=(P(), P()),
    )
    stats_all, hist = fn(x)
    stats_named = stats_all[: len(named)]

    if quantiles and exact_quantiles:
        q_stats = jnp.asarray(
            _sharded_exact_quantiles(
                x,
                mesh=mesh,
                axis_name=axis_name,
                w=w,
                nperseg=nperseg,
                noverlap=noverlap,
                qs=quantiles,
                hist=hist,
                pmin=stats_all[len(named) + 1],
                pmax=stats_all[len(named)],
                edges_dB=edges_dB,
            )
        )
    elif quantiles:
        q_stats = quantile_from_histogram(
            hist, edges_dB, jnp.asarray(quantiles, dtype='float32')
        )  # (Q, nfreq)
    if quantiles:
        rows, named_i, q_i = [], 0, 0
        for is_q in isquantile:
            if is_q:
                rows.append(q_stats[q_i])
                q_i += 1
            else:
                rows.append(stats_named[named_i])
                named_i += 1
        stats = jnp.stack(rows, axis=0)
    else:
        stats = stats_named
    return stats, hist, np.asarray(edges_dB)


def quantile_from_histogram(hist, edges, q):
    """invert a counts histogram to quantile estimates with linear
    interpolation inside the containing bin.

    Args:
        hist: (..., n_bins) counts
        edges: (n_bins + 1,) bin edges
        q: scalar or (Q,) quantiles in [0, 1]

    Returns:
        (Q, ...) quantile estimates (accuracy = bin width)
    """
    xp = jnp if isinstance(hist, jax.Array) else np
    q = xp.atleast_1d(xp.asarray(q, dtype='float32'))
    counts = hist.astype('float32')  # (..., B)
    B = counts.shape[-1]
    cum = xp.cumsum(counts, axis=-1)  # (..., B)
    total = cum[..., -1]  # (...)

    targets = q.reshape((-1,) + (1,) * total.ndim) * total[None]  # (Q, ...)

    # containing bin: count of bins whose cumulative mass is below target
    idx = (cum[None] < targets[..., None]).sum(axis=-1)  # (Q, ...)
    idx = xp.clip(idx, 0, B - 1)

    full = targets.shape + (B,)
    counts_q = xp.take_along_axis(
        xp.broadcast_to(counts[None], full), idx[..., None], axis=-1
    )[..., 0]
    cum_q = xp.take_along_axis(
        xp.broadcast_to(cum[None], full), idx[..., None], axis=-1
    )[..., 0]
    prev = cum_q - counts_q

    frac = xp.where(counts_q > 0, (targets - prev) / xp.maximum(counts_q, 1.0), 0.0)
    frac = xp.clip(frac, 0.0, 1.0)

    edges = xp.asarray(edges)
    lo = edges[:-1][idx]
    wid = (edges[1:] - edges[:-1])[idx]
    return lo + frac * wid


def _apd_body(x_local, *, edges_pow, axis_name):
    from ..ops.power import histogram_edge_counts

    p = x_local.real * x_local.real + x_local.imag * x_local.imag
    # int32 holds ~2.1e9 counts/bin/shard; for larger shards enable
    # jax_enable_x64 or reduce in chunks via parallel.streaming
    counts = histogram_edge_counts(p, edges_pow).astype(jnp.int32)
    return jax.lax.psum(counts, axis_name)


def sharded_apd_histogram(x, *, mesh: Mesh, edges, axis_name: str = TIME_AXIS):
    """global amplitude (power) distribution counts of a time-sharded
    capture: searchsorted + scatter-add per shard, psum across ICI.

    Feed the result to `ccdf_from_counts` for the APD/CCDF (the sharded
    counterpart of ops.power.sample_ccdf, power_analysis.py:552-580).
    """
    # keep edges host-side: a device-resident constant closed over by the
    # trace needs a D2H at lowering on the axon tunnel (CLAUDE.md);
    # histogram_edge_counts promotes inside the trace
    edges_pow = np.asarray(edges)
    fn = jax.shard_map(
        functools.partial(_apd_body, edges_pow=edges_pow, axis_name=axis_name),
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(),
    )
    return fn(x)


def ccdf_from_counts(counts, n_total: int, density: bool = True):
    """CCDF from searchsorted('left') bin counts (matches
    ops.power.sample_ccdf semantics)."""
    xp = jnp if isinstance(counts, jax.Array) else np
    ccdf = (n_total - counts.cumsum(0))[:-1]
    if density:
        ccdf = ccdf.astype('float32') / n_total
    return ccdf
