"""Pallas TPU kernel: channelizer spectrogram statistics in one pass.

Stages 2-5 of the WidebandMonitor step read the resampled stream y
several times through XLA: channelizer frames + window + FFT (one pass),
|Y|^2 spectrogram (materialized), dB conversion + mean/max (two more),
channel reshape-sums, and the APD's power + detector binning (another
read of y). This kernel does all of it in a single pass over y:

    per frame (nfft_big = a*128 samples, viewed (a, 128) in VMEM):
      binned detector power     p_bin = mean(|y|^2 over navg)
      windowed four-step FFT    D[k1, k2] (factored coordinates)
      spectrogram               spg = |D|^2
      accumulate                sum(log(spg + eps)), max(spg)
      channel power             sum over each channel's bin group

The four-step split is chosen as a = nfft_big // 128, b = 128 so the
natural (a, 128) tile IS the factored layout — no transpose anywhere,
and the (k1, k2) -> k2*a + k1 unscramble happens on host-side numpy on
the tiny accumulator arrays. Mean/max of dB commute through the
factored permutation (mean of logs accumulates; max is monotonic in
log).

Reference semantics: fourier.py:1330-1415 (channelize_power) +
fourier.py:1236 (spectrogram statistics) + figures.py:827-836 (binned
power for the CCDF), fused TPU-side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import lru_cache
from .fused_ola_pallas import _make_dot, _on_tpu_like

__all__ = ['chan_stats_packed_pallas', 'chan_stats_pallas', 'chan_stats_supported']

_LANES = 128
_EPS = 1e-25


def chan_stats_supported(
    nfft_big: int, channel_count: int, skip_bins: int, navg: int
) -> bool:
    """the kernel covers the monitor's hot configurations: 128 | nfft_big
    with a >= 8 sublane rows, navg dividing one lane row, and a channel
    layout (including an analysis-bin trim, skip_bins > 0) in which each
    factored-coordinate lane spans at most two channel intervals — i.e.
    at most one channel/trim boundary falls strictly inside any lane's
    a-bin span, so per-channel sums decompose into whole-lane sums plus
    one masked prefix correction per boundary lane (VERDICT r2 #3)."""
    if nfft_big % _LANES or skip_bins % 2 or skip_bins < 0:
        return False
    a = nfft_big // _LANES
    if a < 8 or a % 8 or navg < 1 or _LANES % navg or channel_count > _LANES:
        return False
    if (nfft_big - skip_bins) % channel_count:
        return False
    # at most one boundary strictly inside any lane: boundaries on lane
    # edges are free, interior ones must land in distinct lanes
    analysis_bins = (nfft_big - skip_bins) // channel_count
    bounds = skip_bins // 2 + analysis_bins * np.arange(channel_count + 1)
    interior = bounds[bounds % a != 0]
    lane_of = interior // a
    return np.unique(lane_of).size == lane_of.size


@lru_cache()
def _chan_constants(nfft_big: int, w_key: bytes):
    a = nfft_big // _LANES
    b = _LANES
    w = np.frombuffer(w_key, dtype='complex64').reshape(a, b)

    i1 = np.arange(a)
    i2 = np.arange(b)
    Fa = np.exp(-2j * np.pi * np.outer(i1, i1) / a).astype('complex64')
    W = np.exp(-2j * np.pi * np.outer(i1, i2) / nfft_big).astype('complex64')
    Fb = np.exp(-2j * np.pi * np.outer(i2, i2) / b).astype('complex64')

    def planes(x):
        x = np.ascontiguousarray(x)
        return x.real.astype('float32'), x.imag.astype('float32')

    consts = []
    consts += planes(w)
    consts += planes(Fa)
    consts += planes(W)
    consts += planes(Fb)
    return a, b, tuple(consts)


@lru_cache()
def _group_matrix(b: int, group: int, scale: float):
    """(b, b) matrix summing consecutive ``group``-lane blocks into the
    leading b//group output lanes — lane-group reductions as one MXU dot
    (Mosaic rejects the lane-splitting reshape formulation)."""
    G = np.zeros((b, b), 'float32')
    for j in range(b):
        G[j, j // group] = scale
    return G


@lru_cache()
def _channel_interval_matrices(nfft_big: int, skip_bins: int, channel_count: int):
    """trim-aware per-lane channel assignment (VERDICT r2 #3).

    Channel c owns natural bins [skip/2 + c*analysis, skip/2 +
    (c+1)*analysis); lane j of the factored layout covers the contiguous
    bins [j*a, (j+1)*a) as k1 runs down the sublanes. With at most one
    channel/trim boundary interior to any lane (chan_stats_supported),
    the per-channel power decomposes into

        channel_power = S_full @ ga + P @ gb

    where S_full[t, j] is lane j's whole-column sum, P[t, j] its masked
    prefix sum over sublanes k1 < r(j) (r = the boundary offset), ga
    assigns whole lanes and boundary-lane *suffixes* to their channels,
    and gb = (prefix-channel map) - (suffix-channel map) corrects the
    prefix rows. Returns (ga, gb, maskP, has_boundary).
    """
    a = nfft_big // _LANES
    b = _LANES
    analysis = (nfft_big - skip_bins) // channel_count

    def chan_of(k: int) -> int:
        rel = k - skip_bins // 2
        if rel < 0:
            return -1
        c = rel // analysis
        return c if c < channel_count else -1

    A = np.zeros((b, b), 'float32')
    BL = np.zeros((b, b), 'float32')
    BR = np.zeros((b, b), 'float32')
    maskP = np.zeros((a, b), 'float32')
    has_boundary = False
    for j in range(b):
        chans = [chan_of(j * a + i) for i in range(a)]
        r = 0
        for i in range(1, a):
            if chans[i] != chans[i - 1]:
                r = i
                break
        if r == 0:
            if chans[0] >= 0:
                A[j, chans[0]] = 1.0
        else:
            has_boundary = True
            maskP[:r, j] = 1.0
            if chans[0] >= 0:
                BL[j, chans[0]] = 1.0
            if chans[r] >= 0:
                BR[j, chans[r]] = 1.0
    return A + BR, BL - BR, maskP, has_boundary


def _chan_stats_kernel(
    yr, yi, war, wai, far, fai, twr, twi, fbr, fbi, gbin, gch, gbd, mp,
    *outs, T, a, b, navg, passes, boundary, emit_psd, emit_pbin,
):
    lsum = smax = pbin = None
    i = 0
    if emit_psd:
        lsum, smax = outs[0], outs[1]
        i = 2
    chp = outs[i]
    if emit_pbin:
        pbin = outs[i + 1]

    dot = _make_dot(passes)
    # exact-leaning precision for the tiny grouping dots (counts feed an
    # exact histogram comparison)
    dot6 = _make_dot(6)

    YR = yr[...].reshape(T, a, b)
    YI = yi[...].reshape(T, a, b)

    if emit_pbin:
        # detector-binned power of the raw stream (time domain): the
        # consecutive-navg lane-group means as one MXU dot (gbin maps
        # lane groups onto the leading b//navg lanes); pad lanes forced
        # to +inf so a histogram of the padded layout stays well-defined
        p = YR * YR + YI * YI
        pb = dot6(p, gbin[...])  # (T, a, b), first b//navg lanes live
        lane = jax.lax.broadcasted_iota(jnp.int32, (T * a, b), 1)
        pbin[...] = jnp.where(
            lane < b // navg, pb.reshape(T * a, b), jnp.inf
        )

    # windowed four-step FFT in factored (k1, k2) coordinates; the two
    # complex matmul stages use Gauss's 3-multiplication form at the
    # 1-/3-pass tiers (25% fewer MXU passes; same rationale and error
    # analysis as fused_ola_pallas._fused_chain)
    gauss = passes != 6

    def bc(m):
        return jnp.broadcast_to(m[None], (T,) + m.shape)

    xr = YR * war[...][None] - YI * wai[...][None]
    xi = YR * wai[...][None] + YI * war[...][None]
    if gauss:
        m1 = dot(bc(far[...]), xr + xi)
        m2 = dot(bc(far[...] + fai[...]), xi)
        m3 = dot(bc(fai[...] - far[...]), xr)
        br, bi = m1 - m2, m1 + m3
    else:
        FAR, FAI = bc(far[...]), bc(fai[...])
        br = dot(FAR, xr) - dot(FAI, xi)
        bi = dot(FAR, xi) + dot(FAI, xr)
    cr = br * twr[...][None] - bi * twi[...][None]
    ci = br * twi[...][None] + bi * twr[...][None]
    if gauss:
        m1 = dot(cr + ci, fbr[...])
        m2 = dot(cr, fbi[...] - fbr[...])
        m3 = dot(ci, fbr[...] + fbi[...])
        dr, di = m1 - m3, m1 + m2
    else:
        dr = dot(cr, fbr[...]) - dot(ci, fbi[...])
        di = dot(cr, fbi[...]) + dot(ci, fbr[...])
    spg = dr * dr + di * di  # (T, a, b): |FFT|^2 at bin k2*a + k1

    if emit_psd:
        @pl.when(pl.program_id(0) == 0)
        def _():
            lsum[...] = jnp.zeros_like(lsum)
            smax[...] = jnp.zeros_like(smax)  # spg >= 0

        lsum[...] += jnp.sum(jnp.log(spg + _EPS), axis=0)
        smax[...] = jnp.maximum(smax[...], jnp.max(spg, axis=0))

    # channel power: lane j covers contiguous bins [j*a, (j+1)*a); whole
    # lanes and boundary-lane suffixes assign through the gch dot, and
    # (with an analysis-bin trim) boundary-lane masked prefixes correct
    # through the gbd dot — see _channel_interval_matrices
    s_full = jnp.sum(spg, axis=1)  # (T, b)
    chp_val = dot6(s_full, gch[...])
    if boundary:
        p_pref = jnp.sum(spg * mp[...][None], axis=1)
        chp_val += dot6(p_pref, gbd[...])
    chp[...] = chp_val


def chan_stats_pallas(
    y,
    *,
    nfft_big: int,
    channel_count: int,
    window: np.ndarray,
    navg: int = 1,
    skip_bins: int = 0,
    precision='high',
    frames_per_block: int = 16,
    interpret: bool = None,
    emit_psd: bool = True,
    emit_pbin: bool = True,
):
    """single-pass channelizer statistics of a resampled stream.

    y: (S,) complex64 with S a multiple of nfft_big.
    window: complex (nfft_big,) channelizer window (normalization and
        fftshift baked in, as WidebandMonitor._w_ch / nfft_big).
    skip_bins: total analysis-bandwidth trim (reference
        fourier.py:1399-1404): the outer skip_bins/2 natural bins on each
        side join no channel; channel c owns analysis_bins =
        (nfft_big - skip_bins) / channel_count contiguous kept bins.
    emit_psd / emit_pbin: drop the persistence accumulators / the
        detector-binned power output (and its HBM write, the largest
        output) for channelize-only callers.

    Returns dict:
        psd_log_sum: (nfft_big,) sum over frames of ln(spg + 1e-25),
            natural bin order (full band, no trim) [emit_psd]
        psd_max: (nfft_big,) max over frames of spg, natural bin order
            [emit_psd]
        channel_power: (frames, channel_count) raw per-channel power
        p_binned: (S // navg,) detector-binned |y|^2 (padding removed)
            [emit_pbin]
    """
    if interpret is None:
        interpret = not _on_tpu_like()
    a, b, consts, boundary = _chan_prepare(
        nfft_big, window, navg, skip_bins, channel_count
    )

    M = y.shape[0] // nfft_big
    yr = y.real.reshape(M * a, b)
    yi = y.imag.reshape(M * a, b)
    return _chan_call(
        yr, yi, M=M, a=a, b=b, channel_count=channel_count, navg=navg,
        consts=consts, precision=precision, boundary=boundary,
        frames_per_block=frames_per_block, interpret=interpret,
        col_blocks=(0, 0), emit_psd=emit_psd, emit_pbin=emit_pbin,
    )


def chan_stats_packed_pallas(
    y_packed,
    *,
    nfft_big: int,
    channel_count: int,
    window: np.ndarray,
    navg: int = 1,
    skip_bins: int = 0,
    precision='high',
    frames_per_block: int = 16,
    interpret: bool = None,
):
    """chan_stats_pallas on the packed planes layout produced by
    ops.pallas.fused_ola_pallas.fused_ola_packed: (S/128, 256) float32
    with real in columns 0:128 and imag in 128:256 — the kernel reads
    both halves of the same buffer via column-offset BlockSpecs, so the
    complex stream never materializes."""
    if interpret is None:
        interpret = not _on_tpu_like()
    a, b, consts, boundary = _chan_prepare(
        nfft_big, window, navg, skip_bins, channel_count
    )

    M = y_packed.shape[0] * _LANES // nfft_big
    return _chan_call(
        y_packed, y_packed, M=M, a=a, b=b, channel_count=channel_count,
        navg=navg, consts=consts, precision=precision, boundary=boundary,
        frames_per_block=frames_per_block, interpret=interpret,
        col_blocks=(0, 1),
    )


def _chan_prepare(nfft_big, window, navg, skip_bins, channel_count):
    """shared host-side constant assembly for both kernel entry points:
    DFT/window planes + detector grouping + channel-interval matrices."""
    w = np.asarray(window, dtype='complex64')
    a, b, consts = _chan_constants(nfft_big, w.tobytes())
    gbin = _group_matrix(b, navg, 1.0 / navg)
    gch, gbd, mp, boundary = _channel_interval_matrices(
        nfft_big, skip_bins, channel_count
    )
    return a, b, consts + (gbin, gch, gbd, mp), boundary


def _chan_call(
    yr, yi, *, M, a, b, channel_count, navg, consts, precision,
    frames_per_block, interpret, col_blocks, boundary=False,
    emit_psd=True, emit_pbin=True,
):
    # the per-frame channel-power output block has T sublane rows, so T
    # must stay a multiple of 8 (and divide the frame count)
    T = max(8, (frames_per_block // 8) * 8)
    while T >= 8 and M % T:
        T -= 8
    if T < 8:
        raise ValueError(
            'chan_stats_pallas requires the frame count to be a multiple of 8'
        )

    cr, ci = col_blocks
    in_spec_r = pl.BlockSpec((T * a, b), lambda m, _c=cr: (m, _c))
    in_spec_i = pl.BlockSpec((T * a, b), lambda m, _c=ci: (m, _c))
    acc_spec = pl.BlockSpec((a, b), lambda m: (0, 0))

    def const_spec(c):
        return pl.BlockSpec(c.shape, lambda m: (0, 0))

    out_specs, out_shape = [], []
    if emit_psd:
        out_specs += [acc_spec, acc_spec]
        out_shape += [
            jax.ShapeDtypeStruct((a, b), jnp.float32),
            jax.ShapeDtypeStruct((a, b), jnp.float32),
        ]
    out_specs.append(pl.BlockSpec((T, b), lambda m: (m, 0)))
    out_shape.append(jax.ShapeDtypeStruct((M, b), jnp.float32))
    if emit_pbin:
        out_specs.append(pl.BlockSpec((T * a, b), lambda m: (m, 0)))
        out_shape.append(jax.ShapeDtypeStruct((M * a, b), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(
            _chan_stats_kernel,
            T=T, a=a, b=b, navg=navg, boundary=boundary,
            emit_psd=emit_psd, emit_pbin=emit_pbin,
            passes={'highest': 6, 'high': 3, 'default': 1, 'bf16': 1}.get(
                precision if isinstance(precision, str) else 'highest', 3
            ),
        ),
        grid=(M // T,),
        in_specs=[in_spec_r, in_spec_i] + [const_spec(c) for c in consts],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
        ),
        interpret=interpret,
    )(yr, yi, *[jnp.asarray(c) for c in consts])

    result = {}
    i = 0
    if emit_psd:
        # factored (k1, k2) -> natural k = k2*a + k1 is a transpose of
        # the tiny accumulator blocks
        result['psd_log_sum'] = outs[0].T.reshape(-1)
        result['psd_max'] = outs[1].T.reshape(-1)
        i = 2
    result['channel_power'] = outs[i][:, :channel_count]
    if emit_pbin:
        result['p_binned'] = outs[i + 1][:, : b // navg].reshape(-1)
    return result
