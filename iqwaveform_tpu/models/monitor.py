"""WidebandMonitor: the flagship end-to-end analysis pipeline.

Implements the BASELINE.json north-star workload: a long wideband capture
runs through resample (OLA bandpass) -> channelize -> spectrogram ->
detector statistics + APD, as ONE jit-compiled program — single chip or
sharded across a TPU mesh (time axis over ICI with halo exchange, receiver
batch over a second mesh axis).

The reference has no such composite pipeline as a unit; it is assembled
from fourier.ola_filter (fourier.py:1107), channelize_power
(fourier.py:1330), spectrogram statistics (fourier.py:1236) and
sample_ccdf (power_analysis.py:552). This class fuses those stages so
intermediate frames never round-trip HBM between kernels, and scales them
across chips.
"""

from __future__ import annotations

import dataclasses
import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.filtering import (
    _find_downsample_copy_range,
    _freq_band_edges,
    _ola_filter_parameters,
)
from ..ops.window_design import equivalent_noise_bandwidth, get_window
from ..parallel.mesh import TIME_AXIS, Mesh
from ..parallel.sharded import _local_frames, _sharded_ola_body

BATCH_AXIS = 'rx_batch'

__all__ = [
    'MonitorDesign',
    'WidebandMonitor',
    'design_wideband_monitor',
    'resolve_monitor_design',
]


@dataclasses.dataclass(frozen=True)
class MonitorDesign:
    """static design parameters of the monitor pipeline (all shapes/bins
    are derived on the host; the design-dict pattern of SURVEY.md §5)."""

    fs_in: float
    fs_out: float
    nfft: int  # OLA input FFT size
    nfft_out: int  # OLA output FFT size
    window: str  # COLA window
    passband: tuple  # (lo, hi) Hz after resampling
    channel_count: int
    fft_size_per_channel: int
    analysis_bins_per_channel: int
    channel_window: typing.Union[str, tuple]  # window for the channelizer STFT
    apd_range_dB: tuple
    apd_bins: int
    # power-detector bin size (samples) applied before the APD histogram,
    # matching the reference's binned-power CCDF workflow
    # (figures.py:827-836: plot_power_ccdf with Tavg -> iq_to_bin_power);
    # 1 = per-sample APD
    apd_navg: int = 1
    # 'xla' = jnp.fft; 'mxu' = four-step DFT matmuls (ops.mxu_fft) — much
    # faster on TPU for composite sizes, identical to float32 roundoff.
    # 'auto' (default) resolves per platform/shape at WidebandMonitor
    # construction (resolve_monitor_design): 'mxu' on TPU targets with
    # composite FFT sizes, 'xla' elsewhere
    fft_backend: str = 'auto'
    # matmul precision for the mxu backend: 'highest' (6-pass bf16,
    # ~3e-7 rel), 'high' (3-pass, ~2e-5 max rel / ~1e-6 RMS, ~2x faster),
    # 'bf16' (1-pass + bf16 frame storage in the pallas OLA kernels:
    # halves HBM frame traffic at ~4e-3 rel / ~0.05 dB — opt-in only,
    # exceeds the 1e-5 RMS budget), or 'i16' (int16 frame storage +
    # 3-pass dots: the same halved frame traffic as 'bf16' but LOSSLESS
    # for natively integer captures — feed step_planes() int16 planes
    # straight from a SigMF ci16 payload with input_scale set to the ADC
    # scale; accuracy matches 'high'. Requires ola_kernel='pallas'.)
    # 'auto' (default) resolves to 'high' — the production tier, within
    # the 1e-5 RMS budget (scripts/rms_error_tpu.py gates it) — when the
    # MXU backend resolves on, 'highest' otherwise.
    fft_precision: str = 'auto'
    # multiplicative raw-sample -> physical-units scale applied inside
    # the OLA kernels (folded into the analysis window, so it is free).
    # For ci16 captures the SigMF convention is 1/32768. Non-unity
    # values require ola_kernel='pallas' (the packed kernel path).
    input_scale: float = 1.0
    # fused OLA spectral-transform implementation when the factored path
    # applies: 'matmul' = XLA einsums (ops.mxu_fft.fused_ola_mxu);
    # 'pallas' = VMEM-resident kernel (ops.pallas.fused_ola_pallas) — the
    # whole per-frame chain in one kernel, ~no HBM intermediates.
    # 'auto' (default) resolves to 'pallas' on TPU targets when the
    # fused kernel supports the design, 'matmul' otherwise
    ola_kernel: str = 'auto'
    # APD histogram implementation: 'sort' = sort + searchsorted
    # (ops.power.histogram_edge_counts); 'pallas' = direct edge-compare
    # kernel (ops.pallas.hist_pallas) — identical counts, ~3x faster;
    # 'packed' = factored two-level counting in dB space
    # (ops.pallas.colhist_pallas) — O(2*sqrt(B)) vs O(B) work per
    # sample, totals exact, edge-tie samples may land one bin over.
    # Pick by sample count: at apd_navg=16 bench shapes (0.5M binned
    # samples) edge-compare wins (v5e: 5020 vs 4362 MS/s flagship);
    # at apd_navg=1 (8.4M samples, 2048 bins) 'packed' counts 6.2x
    # faster (13.4 -> 2.2 ms, scripts/probe_apd_kernels.py).
    # 'auto' (default) = resolve 'pallas' vs 'packed' from the
    # trace-time binned sample count (crossover ~2M; docs/BENCH_notes.md)
    # on TPU targets, 'sort' elsewhere
    apd_kernel: str = 'auto'
    # channelizer-statistics implementation: 'xla' = framed FFT +
    # reductions; 'pallas' = single-pass fused kernel
    # (ops.pallas.chan_stats_pallas) — FFT, spectrogram stats, channel
    # power, and detector binning in one read of the resampled stream.
    # 'auto' (default) resolves to 'pallas' on TPU targets when the
    # kernel supports the channel layout, 'xla' otherwise
    chan_kernel: str = 'auto'


def design_wideband_monitor(
    fs_base: float,
    fs_target: float,
    *,
    bw: float = float('inf'),
    channel_count: int = 16,
    fft_size_per_channel: int = 256,
    analysis_bins_per_channel: int = None,
    window: str = 'hamming',
    channel_window='hann',
    apd_range_dB=(-120.0, 30.0),
    apd_bins: int = 2048,
    apd_navg: int = 1,
    fft_backend: str = 'auto',
    fft_precision: str = 'auto',
    ola_kernel: str = 'auto',
    apd_kernel: str = 'auto',
    chan_kernel: str = 'auto',
    input_scale: float = 1.0,
    **resampler_kws,
) -> MonitorDesign:
    """derive a MonitorDesign from radio rates (host-side design math,
    built on ops.filtering.design_cola_resampler; extra keywords pass
    through, e.g. fs_sdr= to force the input rate).

    Kernel/backend fields default to 'auto': WidebandMonitor resolves
    them to the fastest implementation the platform and design support
    (resolve_monitor_design), so the out-of-box design runs the benched
    fast path on TPU and plain XLA elsewhere."""
    from ..ops.filtering import design_cola_resampler

    d = design_cola_resampler(fs_base, fs_target, bw=bw, window=window, **resampler_kws)
    if analysis_bins_per_channel is None:
        analysis_bins_per_channel = fft_size_per_channel

    return MonitorDesign(
        fs_in=d['fs'],
        fs_out=d['fs'] * d['nfft_out'] / d['nfft'],
        nfft=d['nfft'],
        nfft_out=d['nfft_out'],
        window=d['window'],
        passband=d['passband'],
        channel_count=channel_count,
        fft_size_per_channel=fft_size_per_channel,
        analysis_bins_per_channel=analysis_bins_per_channel,
        channel_window=channel_window,
        apd_range_dB=apd_range_dB,
        apd_bins=apd_bins,
        apd_navg=apd_navg,
        fft_backend=fft_backend,
        fft_precision=fft_precision,
        ola_kernel=ola_kernel,
        apd_kernel=apd_kernel,
        chan_kernel=chan_kernel,
        input_scale=input_scale,
    )


def _monitor_passband_bounds(d: MonitorDesign):
    """host-side passband bin geometry shared by the design resolver and
    WidebandMonitor: (zero_lo, zero_hi, bounds_in, bounds_out)."""
    enbw = float(equivalent_noise_bandwidth(d.window, d.nfft_out, fftbins=False))
    pb_lo = None if d.passband[0] is None else d.passband[0] + enbw
    pb_hi = None if d.passband[1] is None else d.passband[1] - enbw
    zero_lo, zero_hi = _freq_band_edges(d.nfft, 1.0 / d.fs_in, pb_lo, pb_hi)

    pb_start, pb_end = _freq_band_edges(d.nfft, 1.0 / d.fs_in, *d.passband)
    bounds_out, bounds_in, _ = _find_downsample_copy_range(
        d.nfft, d.nfft_out, pb_start, pb_end
    )
    return (0 if zero_lo is None else zero_lo), zero_hi, bounds_in, bounds_out


def resolve_monitor_design(design: MonitorDesign, *, tpu: bool = None) -> MonitorDesign:
    """resolve a design's 'auto' kernel/backend fields to the fastest
    concrete implementation whose platform and shape constraints hold,
    falling back to the XLA paths otherwise.

    The reference auto-picks its fastest backend the same way (the
    upfirdn CUDA dispatch heuristic, fourier.py:1476-1495, and the
    numexpr fast paths, power_analysis.py:183-196); here the decision is
    host-side and explicit so the resolved design is inspectable.
    Explicit (non-'auto') fields pass through unchanged — opting into a
    specific kernel still errors loudly when unsupported, which is what
    CI's strict mode relies on.

    ``tpu`` overrides platform detection (ops.pallas._common.on_tpu_like)
    for tests; resolution is idempotent, so a resolved design can be
    passed to WidebandMonitor on any platform (CPU runs the Pallas
    kernels in interpret mode).
    """
    d = design
    auto = {
        name
        for name in (
            'fft_backend', 'fft_precision', 'ola_kernel', 'apd_kernel',
            'chan_kernel',
        )
        if getattr(d, name) == 'auto'
    }
    if not auto:
        return d
    if tpu is None:
        from ..ops.pallas._common import on_tpu_like

        tpu = on_tpu_like()

    from ..ops.mxu_fft import fused_ola_supported, plan_factors

    nfft_big = d.fft_size_per_channel * d.channel_count
    skip_bins = d.channel_count * (
        d.fft_size_per_channel - d.analysis_bins_per_channel
    )

    def composite(n):
        try:
            plan_factors(n)
            return True
        except ValueError:
            return False

    kw = {}
    fft_backend = d.fft_backend
    if fft_backend == 'auto':
        fft_backend = (
            'mxu'
            if tpu
            and composite(d.nfft)
            and composite(d.nfft_out)
            and composite(nfft_big)
            else 'xla'
        )
        kw['fft_backend'] = fft_backend
    if d.fft_precision == 'auto':
        # 'high' (3-pass hi/lo bf16 dots) is the production MXU tier:
        # ~1e-6 RMS, inside the 1e-5 budget and RMS-gate validated at
        # round close. Off-TPU the bf16 split only costs accuracy (no
        # MXU pass savings), so explicit-mxu designs on CPU stay f32.
        kw['fft_precision'] = (
            'high' if (fft_backend == 'mxu' and tpu) else 'highest'
        )
    if d.ola_kernel == 'auto':
        armed = False
        if tpu and fft_backend == 'mxu' and d.nfft_out != d.nfft:
            _, _, bounds_in, bounds_out = _monitor_passband_bounds(d)
            armed = fused_ola_supported(
                d.nfft, d.nfft_out, bounds_in, bounds_out
            )
        kw['ola_kernel'] = 'pallas' if armed else 'matmul'
    if d.chan_kernel == 'auto':
        from ..ops.pallas.chan_stats_pallas import chan_stats_supported

        armed = tpu and chan_stats_supported(
            nfft_big, d.channel_count, skip_bins, d.apd_navg
        )
        kw['chan_kernel'] = 'pallas' if armed else 'xla'
    if d.apd_kernel == 'auto' and not tpu:
        # on TPU, 'auto' stays: _hist resolves 'packed' vs 'pallas' per
        # program from the trace-time binned sample count
        kw['apd_kernel'] = 'sort'
    return dataclasses.replace(d, **kw) if kw else d


class WidebandMonitor:
    """end-to-end wideband monitor step.

    Usage (single chip):

        mon = WidebandMonitor(design)
        out = jax.jit(mon.step)(iq)          # iq: (N,) complex64

    Usage (multi-chip):

        mon = WidebandMonitor(design, mesh=mesh)
        out = mon.sharded_step(iq_sharded)   # iq: (B, N) sharded

    Outputs (dict):
        channel_power: (frames, channels) per-channel power time series
        channel_power_mean/max: (channels,) detector statistics
        psd_mean/psd_max: (total fft bins,) persistence statistics (dB)
        apd_counts: (apd_bins + 1,) global power histogram counts
        apd_edges_dB: static bin edges
    """

    def __init__(
        self,
        design: MonitorDesign,
        mesh: Mesh = None,
        time_axis: str = TIME_AXIS,
        batch_axis: str = BATCH_AXIS,
    ):
        # resolve 'auto' kernel/backend fields for this platform; the
        # as-requested design stays inspectable on requested_design
        self.requested_design = design
        design = resolve_monitor_design(design)
        self.design = design
        self.mesh = mesh
        self.time_axis = time_axis
        self.batch_axis = batch_axis

        d = design
        nfft_out, noverlap_out, overlap_scale, _ = _ola_filter_parameters(
            0, window=d.window, nfft_out=d.nfft_out, nfft=d.nfft, extend=True
        )
        self.noverlap_in = round(d.nfft * overlap_scale)
        self.noverlap_out = noverlap_out
        self.hop_in = d.nfft - self.noverlap_in

        # static windows (complex delay baked in)
        self._w_in = get_window(d.window, d.nfft, xp=np, dtype='complex64', fftshift=True)
        self._w_shift_out = get_window(
            'rect', d.nfft_out, xp=np, dtype='complex64', fftshift=True
        )
        self._nfft_big = d.fft_size_per_channel * d.channel_count
        self._w_ch = get_window(
            d.channel_window,
            self._nfft_big,
            xp=np,
            dtype='complex64',
            norm=True,
            fftshift=True,
        )

        # static passband bin bounds
        (
            self._zero_lo,
            self._zero_hi,
            self._bounds_in,
            self._bounds_out,
        ) = _monitor_passband_bounds(d)

        # APD power-bin edges from dB range
        edges_dB = np.linspace(d.apd_range_dB[0], d.apd_range_dB[1], d.apd_bins)
        self.apd_edges_dB = edges_dB
        # host numpy: device constants embed into traces from host (the
        # axon tunnel cannot D2H-copy non-float32 device arrays)
        self._apd_edges_pow = (10 ** (edges_dB / 10.0)).astype('float32')

        # FFT implementation for the hot loops
        self._fused_ola = None
        self._fused_ola_raw = None
        if d.fft_backend == 'mxu':
            import functools as _ft

            import jax as _jax

            from ..ops.mxu_fft import fft_mxu, ifft_mxu

            prec = {
                'highest': _jax.lax.Precision.HIGHEST,
                'high': 'high',
                # 1-pass bf16 dots AND bf16 frame storage in the pallas
                # kernels (~4e-3 rel; opt-in — see fused_ola_pallas)
                'bf16': _jax.lax.Precision.DEFAULT,
                # int16 frame storage + 3-pass dots in the pallas
                # kernels; the non-pallas fallbacks see float32 and run
                # the 3-pass tier
                'i16': 'high',
            }[d.fft_precision]
            self._fft = _ft.partial(fft_mxu, precision=prec)
            self._ifft = _ft.partial(ifft_mxu, precision=prec)

            from ..ops.mxu_fft import fused_ola_mxu, fused_ola_supported

            if d.nfft_out != d.nfft and fused_ola_supported(
                d.nfft, d.nfft_out, self._bounds_in, self._bounds_out
            ):
                self._fused_ola = _ft.partial(
                    fused_ola_mxu,
                    nfft=d.nfft,
                    nfft_out=d.nfft_out,
                    zero_lo=self._zero_lo,
                    zero_hi=self._zero_hi,
                    bounds_in=self._bounds_in,
                    bounds_out=self._bounds_out,
                    precision=prec,
                )
                if d.ola_kernel == 'pallas':
                    from ..ops.pallas.fused_ola_pallas import fused_ola_pallas

                    wind = (
                        d.input_scale
                        * self._w_in
                        / np.abs(self._w_in[:: self.hop_in]).sum()
                    ).astype('complex64')
                    self._fused_ola_raw = _ft.partial(
                        fused_ola_pallas,
                        nfft=d.nfft,
                        nfft_out=d.nfft_out,
                        zero_lo=self._zero_lo,
                        zero_hi=self._zero_hi,
                        bounds_in=self._bounds_in,
                        bounds_out=self._bounds_out,
                        w_in=wind,
                        w_shift_out=np.asarray(self._w_shift_out),
                        # the string form: 'bf16' selects bf16 frame
                        # storage inside the kernel, not just dot passes
                        precision=d.fft_precision,
                    )
                elif d.ola_kernel != 'matmul':
                    raise ValueError(
                        f"ola_kernel must be 'matmul' or 'pallas', not {d.ola_kernel!r}"
                    )
        elif d.fft_backend == 'xla':
            self._fft, self._ifft = jnp.fft.fft, jnp.fft.ifft
        else:
            raise ValueError(f"fft_backend must be 'xla' or 'mxu', not {d.fft_backend!r}")

        if d.apd_kernel not in ('sort', 'pallas', 'packed', 'auto'):
            raise ValueError(
                "apd_kernel must be 'sort', 'pallas', 'packed', or "
                f"'auto', not {d.apd_kernel!r}"
            )

        # channel analysis-bin trim
        self._skip_bins = d.channel_count * (
            d.fft_size_per_channel - d.analysis_bins_per_channel
        )
        if self._skip_bins % 2 == 1:
            raise ValueError('channel trim requires an even number of skipped bins')

        self._chan_stats = None
        if d.chan_kernel == 'pallas':
            from ..ops.pallas.chan_stats_pallas import (
                chan_stats_pallas,
                chan_stats_supported,
            )

            if not chan_stats_supported(
                self._nfft_big, d.channel_count, self._skip_bins, d.apd_navg
            ):
                raise ValueError(
                    "chan_kernel='pallas' requires 128 | channelizer FFT "
                    'size with >= 8 sublane rows, apd_navg dividing 128, '
                    'and at most one channel/trim boundary per factored '
                    'lane (chan_stats_supported)'
                )
            import functools as _ft

            self._chan_stats = _ft.partial(
                chan_stats_pallas,
                nfft_big=self._nfft_big,
                channel_count=d.channel_count,
                window=np.asarray(self._w_ch) / self._nfft_big,
                navg=d.apd_navg,
                skip_bins=self._skip_bins,
                precision=d.fft_precision,
            )
        elif d.chan_kernel != 'xla':
            raise ValueError(
                f"chan_kernel must be 'xla' or 'pallas', not {d.chan_kernel!r}"
            )

        # fully-packed fast path: when both kernels are armed and the
        # shapes align, the complex resampled stream never materializes —
        # the packed-planes OLA kernel output feeds a row-shifted
        # overlap-add and the packed channelizer kernel directly
        self._packed_ola = None
        self._chan_stats_packed = None
        self._strided_ola = None
        if self._chan_stats is not None and d.ola_kernel == 'pallas':
            from ..ops.pallas.chan_stats_pallas import chan_stats_packed_pallas
            from ..ops.pallas.fused_ola_pallas import (
                fused_ola_packed,
                fused_ola_packed_supported,
            )

            hop_out = d.nfft_out - self.noverlap_out
            if (
                fused_ola_packed_supported(
                    d.nfft, d.nfft_out, self._bounds_in, self._bounds_out
                )
                and hop_out % 128 == 0
                and self.noverlap_out % 128 == 0
            ):
                import functools as _ft

                wind = (
                    d.input_scale
                    * self._w_in
                    / np.abs(self._w_in[:: self.hop_in]).sum()
                ).astype('complex64')
                prec = d.fft_precision
                self._packed_ola = _ft.partial(
                    fused_ola_packed,
                    nfft=d.nfft,
                    nfft_out=d.nfft_out,
                    zero_lo=self._zero_lo,
                    zero_hi=self._zero_hi,
                    bounds_in=self._bounds_in,
                    bounds_out=self._bounds_out,
                    w_in=wind,
                    w_shift_out=np.asarray(self._w_shift_out),
                    precision=prec,
                )
                self._chan_stats_packed = _ft.partial(
                    chan_stats_packed_pallas,
                    nfft_big=self._nfft_big,
                    channel_count=d.channel_count,
                    window=np.asarray(self._w_ch) / self._nfft_big,
                    navg=d.apd_navg,
                    skip_bins=self._skip_bins,
                    precision=prec,
                )

                from ..ops.pallas.fused_ola_pallas import (
                    fused_ola_strided,
                    fused_ola_strided_supported,
                )

                # at exactly 2:1 frame overlap the framing itself fuses
                # into the kernel's block fetch (each hop read once per
                # half; no frame-slab materialization)
                self._strided_ola = None
                if fused_ola_strided_supported(
                    d.nfft, d.nfft_out, self.hop_in,
                    self._bounds_in, self._bounds_out,
                ):
                    self._strided_ola = _ft.partial(
                        fused_ola_strided,
                        hop_in=self.hop_in,
                        nfft=d.nfft,
                        nfft_out=d.nfft_out,
                        zero_lo=self._zero_lo,
                        zero_hi=self._zero_hi,
                        bounds_in=self._bounds_in,
                        bounds_out=self._bounds_out,
                        w_in=wind,
                        w_shift_out=np.asarray(self._w_shift_out),
                        precision=prec,
                    )

        # raw-sample scaling ('i16' integer captures / calibrated ADC
        # counts) only has a consistent injection point in the pallas
        # OLA kernels' folded analysis window — require that one of
        # those kernels actually ARMED, not just that the flags were
        # set (e.g. nfft_out == nfft never arms the fused path, and the
        # scale would silently never apply)
        if (d.fft_precision == 'i16' or d.input_scale != 1.0) and (
            self._fused_ola_raw is None and self._packed_ola is None
        ):
            raise ValueError(
                "fft_precision='i16' / input_scale != 1 require a "
                "design where the fused pallas OLA path arms "
                "(fft_backend='mxu', ola_kernel='pallas', and a "
                'resampling nfft -> nfft_out the fused kernel supports)'
            )

    def _hist(self, p, force_xla: bool = False):
        """APD histogram counts per design.apd_kernel: sort+searchsorted,
        the direct edge-compare Pallas kernel (identical counts,
        1.9 -> 0.6 ms at bench shapes), or the factored two-level
        counting kernel ('packed': the APD edges are uniform in dB, so
        binning linear power against 10^(edges/10) is a uniform
        quantize of 10*log10(p) — O(2*sqrt(B)) one-hot cells per sample
        instead of B edge compares; totals exact, a sample within f32
        rounding of an edge may land one bin over, same envelope as the
        other packed counters).

        force_xla=True pins the sort path (the grad_fallback twin)."""
        from ..ops.power import histogram_edge_counts

        kernel = 'sort' if force_xla else self.design.apd_kernel
        if kernel == 'auto':
            # edge-compare costs O(samples x bins) while the packed-raw
            # counter is ~flat in bins with a fixed quadrant-dot floor,
            # so the crossover scales inversely with the bin count
            # (round-4 probe, docs/BENCH_notes.md "APD kernel choice");
            # the binned sample count is static at trace time, so
            # resolve per program
            # threshold 2^31: the flagship operating point (0.5M binned
            # x 2049 bins = 1.07e9) measures FASTER on edge-compare
            # in-pipeline (3.30 vs 3.77 ms full step) even though the
            # standalone probe favors packed-raw there — the crossover
            # sits near n*B = 2^30-2^31 within tunnel spread, while at
            # 8.4M x 2049 packed-raw wins 8.5x (1.59 vs 13.5 ms)
            kernel = (
                'packed'
                if p.shape[0] * (self.design.apd_bins + 1) >= (1 << 31)
                else 'pallas'
            )
        if kernel == 'packed':
            from ..ops.pallas.colhist_pallas import (
                columnwise_histogram_packed_raw,
                packed_plan,
                unpack_packed_counts_total,
            )

            d = self.design
            lo, hi = d.apd_range_dB
            w = (hi - lo) / (d.apd_bins - 1)
            v = 10.0 * jnp.log10(p)
            # searchsorted(edges, ., 'left') == ceil((v - lo)/w) away
            # from exact edge ties; clip folds under/overflow into the
            # contract's first/last regions
            idx = jnp.clip(jnp.ceil((v - lo) / w), 0, d.apd_bins).astype(
                jnp.int32
            )
            n = idx.shape[0]
            cols = 128
            pad = (-n) % cols
            if pad:
                # pad level apd_bins+1 lies outside the [:B] readout
                # slice, so padding never counts
                idx = jnp.concatenate(
                    [idx, jnp.full((pad,), d.apd_bins + 1, jnp.int32)]
                )
            # raw tiles + the fused diagonal-trace column-sum readout:
            # ~10x cheaper than extracting per-column counts and
            # summing (the strided diagonal gather; round-4 finding)
            plan = packed_plan(d.apd_bins + 1, cols)
            raw = columnwise_histogram_packed_raw(
                levels=(idx.reshape(-1, cols), d.apd_bins + 1), plan=plan
            )
            return unpack_packed_counts_total(raw, plan)
        if kernel == 'pallas':
            from ..ops.pallas.hist_pallas import histogram_edge_counts_pallas

            return histogram_edge_counts_pallas(p, self._apd_edges_pow)
        return histogram_edge_counts(p, self._apd_edges_pow)

    def _apd_counts(self, y, force_xla: bool = False):
        """detector-binned power histogram of the resampled stream
        (reference binned-power CCDF workflow, figures.py:827-836).

        Binning uses the block-diagonal MXU matmul (ops.power.
        binned_mean_matmul: 0.88 -> 0.03 ms at bench shapes)."""
        from ..ops.power import binned_mean_matmul

        d = self.design
        p = y.real * y.real + y.imag * y.imag
        if d.apd_navg > 1:
            navg_total = (p.shape[0] // d.apd_navg) * d.apd_navg
            p = binned_mean_matmul(p[:navg_total], d.apd_navg)
        return self._hist(p, force_xla=force_xla)

    def _chan_apd(self, y, force_xla: bool = False):
        """channelizer + statistics + APD of a resampled chunk.

        Returns (channel_power, psd_dB_sum, psd_dB_max, apd_counts,
        n_frames) — sums over frames so both the one-shot and streaming
        paths consume the same pieces. With chan_kernel='pallas' the
        whole stage is one pass over ``y``
        (ops.pallas.chan_stats_pallas); mean-of-dB accumulates as
        sum-of-logs and max commutes with log.

        Differentiation dispatches the kernel paths to the XLA
        formulation (grad_fallback; force_xla=True is that twin)."""
        n_frames = y.shape[0] // self._nfft_big
        chan_kernel_armed = self._chan_stats is not None and n_frames % 8 == 0
        hist_kernel_armed = self.design.apd_kernel != 'sort'
        if force_xla or not (chan_kernel_armed or hist_kernel_armed):
            out = self._chan_apd_impl(y, n_frames, force_xla)
        else:
            from ..ops.pallas._common import grad_fallback

            out = grad_fallback(
                lambda v: self._chan_apd_impl(v, n_frames, False),
                lambda v: self._chan_apd_impl(v, n_frames, True),
            )(y)
        return (*out, n_frames)

    def _chan_apd_impl(self, y, n_frames: int, force_xla: bool):
        d = self.design
        nfft_big = self._nfft_big

        if (
            not force_xla
            and self._chan_stats is not None
            and n_frames % 8 == 0
        ):
            cs = self._chan_stats(y[: n_frames * nfft_big])
            channel_power = cs['channel_power']
            psd_dB_sum = (10.0 / float(np.log(10.0))) * cs['psd_log_sum']
            psd_dB_max = 10.0 * jnp.log10(cs['psd_max'] + 1e-25)
            # int32 normalization: the kernel counters return exact
            # integer-valued f32, the sort path int32 — the grad twin's
            # output dtypes must match the primal's
            apd = self._hist(cs['p_binned']).astype(jnp.int32)
            return channel_power, psd_dB_sum, psd_dB_max, apd

        frames = y[: n_frames * nfft_big].reshape(n_frames, nfft_big)
        wind = (self._w_ch / nfft_big).astype(frames.dtype)
        Y = self._fft(frames * wind[None, :], axis=1)
        spg = Y.real * Y.real + Y.imag * Y.imag  # (frames, nfft_big)

        sb = self._skip_bins
        Xa = spg[:, sb // 2 : spg.shape[1] - sb // 2] if sb else spg
        ch = Xa.reshape(n_frames, d.channel_count, d.analysis_bins_per_channel)
        channel_power = ch.sum(axis=2)  # (frames, channels)

        psd_dB = 10.0 * jnp.log10(spg + 1e-25)
        # bin the same whole-frame sample set as the chan_kernel='pallas'
        # branch so APD counts are identical across backends
        apd = self._apd_counts(
            y[: n_frames * nfft_big], force_xla=force_xla
        ).astype(jnp.int32)
        return channel_power, psd_dB.sum(axis=0), psd_dB.max(axis=0), apd

    # ---- core single-signal body (traceable; axis_name=None -> 1 chip) ----

    def _packed_applies(self, n_samples: int) -> bool:
        """static (trace-time) check that the fully-packed path covers
        this input length: whole frame groups for the gather-free OLA
        and a multiple-of-8 channelizer frame count."""
        if self._packed_ola is None:
            return False
        d = self.design
        hop_in = self.hop_in
        hop_out = d.nfft_out - self.noverlap_out
        n_frames = n_samples // hop_in
        R = d.nfft // hop_in if self.noverlap_in > 0 else 1
        if self.noverlap_in == 0 or d.nfft % hop_in or n_frames % R:
            return False
        if n_samples % hop_in:
            # a partial trailing hop has no defined frame/halo alignment
            # on the packed path (the strided kernel reshapes the whole
            # plane into hop rows); fall back to the unpacked body
            return False
        if R != d.nfft_out // hop_out:
            return False
        chan_frames = n_frames * hop_out // self._nfft_big
        return (
            n_frames * hop_out % self._nfft_big == 0
            and chan_frames % 8 == 0
            and chan_frames > 0
        )

    def _packed_resample(self, planes, axis_name):
        """OLA bandpass + resample stage of the packed body: (2, N)
        sample planes (float32, or int16 raw counts at the 'i16' tier)
        -> packed (rows, 256) float32 planes of the resampled output
        (halo-exchanged under ``axis_name``)."""
        d = self.design
        hop_in = self.hop_in
        hop_out = d.nfft_out - self.noverlap_out
        S = planes.shape[1]
        n_frames = S // hop_in
        R = d.nfft // hop_in
        M1 = n_frames // R
        if self.noverlap_in > 0:
            if axis_name is None:
                halo = jnp.zeros((2, self.noverlap_in), planes.dtype)
            else:
                n_dev = jax.lax.axis_size(axis_name)
                idx = jax.lax.axis_index(axis_name)
                perm = [((i + 1) % n_dev, i) for i in range(n_dev)]
                halo = jax.lax.ppermute(
                    planes[:, : self.noverlap_in], axis_name, perm
                )
                halo = jnp.where(idx == n_dev - 1, 0.0, halo)
            if self._strided_ola is None:
                # the grouped fallback reads the halo as extra trailing
                # samples; the strided kernel takes it as a side operand
                # (no full-plane copy)
                planes = jnp.concatenate([planes, halo], axis=1)

        rows_out = n_frames * hop_out // 128
        shift_rows = hop_out // 128
        nov_rows = self.noverlap_out // 128
        if self._strided_ola is not None:
            # framing + the 2:1 overlap-add run inside the kernel (R ==
            # 2, so each frame is two consecutive hop-blocks); the final
            # frame's dangling half comes back as ``tail`` for the
            # shard halo exchange below
            acc, tail = self._strided_ola(planes, halo, n_frames=n_frames)
        else:
            # gather-free grouped OLA on planes: R shifted contiguous
            # reshapes in, R row-shifted adds of packed kernel output
            acc = jnp.zeros((rows_out + nov_rows, 256), jnp.float32)
            for g in range(R):
                frg = jax.lax.dynamic_slice(
                    planes[0], (g * hop_in,), (M1 * d.nfft,)
                ).reshape(M1, d.nfft)
                fig = jax.lax.dynamic_slice(
                    planes[1], (g * hop_in,), (M1 * d.nfft,)
                ).reshape(M1, d.nfft)
                pk = self._packed_ola(frg, fig)  # (M1 * nfft_out/128, 256)
                start = g * shift_rows
                length = min(pk.shape[0], acc.shape[0] - start)
                acc = acc.at[start : start + length].add(pk[:length])
            tail = acc[rows_out:]
            acc = acc[:rows_out]

        if nov_rows and axis_name is not None:
            n_dev = jax.lax.axis_size(axis_name)
            idx = jax.lax.axis_index(axis_name)
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            incoming = jax.lax.ppermute(tail, axis_name, perm)
            incoming = jnp.where(idx == 0, jnp.zeros_like(incoming), incoming)
            y_packed = acc.at[:nov_rows].add(incoming)
        else:
            y_packed = acc
        return y_packed

    def _body_packed(self, x, axis_name):
        """the fully-packed monitor body: planes in, packed kernels
        throughout, no complex intermediate streams."""
        # elided by XLA when x was built by unpack_iq(planes)
        return self._body_packed_planes(
            jnp.stack([x.real, x.imag]), axis_name
        )

    def _body_packed_planes(self, planes, axis_name):
        """packed-kernel body with defined grad semantics: the packed
        Pallas kernels have no JVP rules (and no same-layout XLA twins),
        so differentiation dispatches the WHOLE body to the unpacked
        XLA formulation (grad_fallback) — same outputs up to kernel
        precision, tested equal by test_monitor."""
        from ..ops.pallas._common import grad_fallback
        from ..utils.dispatch import unpack_iq

        def _twin(p):
            return self._body_unpacked(
                unpack_iq(p), axis_name, force_xla=True
            )

        return grad_fallback(
            lambda p: self._body_packed_planes_impl(p, axis_name), _twin
        )(planes)

    def _body_packed_planes_impl(self, planes, axis_name):
        y_packed = self._packed_resample(planes, axis_name)

        # channelizer + statistics + APD, packed all the way
        cs = self._chan_stats_packed(y_packed)
        channel_power = cs['channel_power']
        n_chan_frames = channel_power.shape[0]
        psd_mean = (
            (10.0 / float(np.log(10.0))) * cs['psd_log_sum'] / n_chan_frames
        )
        psd_max = 10.0 * jnp.log10(cs['psd_max'] + 1e-25)
        apd = self._hist(cs['p_binned']).astype(jnp.int32)
        ch_mean = channel_power.mean(axis=0)
        ch_max = channel_power.max(axis=0)

        if axis_name is not None:
            psd_mean = jax.lax.pmean(psd_mean, axis_name)
            psd_max = jax.lax.pmax(psd_max, axis_name)
            ch_mean = jax.lax.pmean(ch_mean, axis_name)
            ch_max = jax.lax.pmax(ch_max, axis_name)
            apd = jax.lax.psum(apd, axis_name)

        return {
            'channel_power': channel_power,
            'channel_power_mean': ch_mean,
            'channel_power_max': ch_max,
            'psd_mean': psd_mean,
            'psd_max': psd_max,
            'apd_counts': apd,
        }

    def _body_1d(self, x, axis_name):
        if self._packed_applies(x.shape[0]):
            return self._body_packed(x, axis_name)
        return self._body_unpacked(x, axis_name)

    def _body_unpacked(self, x, axis_name, force_xla: bool = False):
        """the unpacked monitor body. force_xla=True bypasses every
        Pallas kernel (the grad_fallback twin for the packed body; the
        unpacked body's own kernels carry their twins at their dispatch
        sites)."""
        d = self.design

        # stage 1: OLA bandpass + rational resample
        y = _sharded_ola_body(
            x,
            w_in=self._w_in,
            w_shift_out=self._w_shift_out,
            nfft=d.nfft,
            nfft_out=d.nfft_out,
            noverlap_in=self.noverlap_in,
            noverlap_out=self.noverlap_out,
            bounds_in=self._bounds_in,
            bounds_out=self._bounds_out,
            zero_lo=self._zero_lo,
            zero_hi=self._zero_hi,
            axis_name=axis_name,
            fft_fn=self._fft,
            ifft_fn=self._ifft,
            fused_fn=self._fused_ola,
            fused_raw_fn=None if force_xla else self._fused_ola_raw,
            input_scale=d.input_scale,
        )
        if force_xla and d.input_scale != 1.0:
            # the scale the pallas kernels fold into the analysis window
            y = y * d.input_scale

        # stages 2-5: channelizer STFT, channel power, statistics, APD
        channel_power, psd_dB_sum, psd_dB_max, apd, n_frames = self._chan_apd(
            y, force_xla=force_xla
        )
        psd_mean = psd_dB_sum / n_frames
        psd_max = psd_dB_max
        ch_mean = channel_power.mean(axis=0)
        ch_max = channel_power.max(axis=0)
        apd = apd.astype(jnp.int32)

        if axis_name is not None:
            psd_mean = jax.lax.pmean(psd_mean, axis_name)
            psd_max = jax.lax.pmax(psd_max, axis_name)
            ch_mean = jax.lax.pmean(ch_mean, axis_name)
            ch_max = jax.lax.pmax(ch_max, axis_name)
            apd = jax.lax.psum(apd, axis_name)

        return {
            'channel_power': channel_power,
            'channel_power_mean': ch_mean,
            'channel_power_max': ch_max,
            'psd_mean': psd_mean,
            'psd_max': psd_max,
            'apd_counts': apd,
        }

    # ---- public entry points ----

    def step(self, iq):
        """single-chip forward step. iq: (N,) or (B, N) complex64, with N a
        multiple of hop*channel FFT alignment."""
        if iq.ndim == 1:
            return self._body_1d(iq, None)
        if self._packed_applies(iq.shape[1]):
            # build the (B, 2, N) planes once OUTSIDE the vmap: stacking
            # per row inside the vmapped body materializes a transposed
            # copy XLA does not elide (~10% of the rx4 step,
            # scripts/probe_rx_batch.py)
            planes = jnp.stack([iq.real, iq.imag], axis=1)
            return jax.vmap(lambda p: self._body_packed_planes(p, None))(
                planes
            )
        return jax.vmap(lambda row: self._body_1d(row, None))(iq)

    def step_planes(self, planes):
        """single-chip forward step on raw (2, N) (real, imag) sample
        planes with no complex intermediate — the native entry for
        integer SDR captures: at fft_precision='i16', pass int16 planes
        straight from a SigMF ci16 payload (io.read_iq_planes) and set
        design.input_scale to the ADC scale; the planes cross
        host->device at half the float32 transfer size and the kernels
        dequantize in VMEM. At the float tiers, float32 planes give
        identical results to step(unpack_iq(planes)); at 'i16', float
        planes are rounded to the nearest integer count before storage
        (pass raw counts, not pre-scaled values)."""
        if planes.ndim == 3:
            return jax.vmap(lambda p: self.step_planes(p))(planes)
        if not self._packed_applies(planes.shape[1]):
            raise ValueError(
                'step_planes requires the fully-packed kernel path '
                "(fft_backend='mxu', ola_kernel='pallas', "
                "chan_kernel='pallas', aligned input length "
                f'{planes.shape[1]}; see min_input_multiple)'
            )
        return self._body_packed_planes(planes, None)

    def sharded_step(self, iq):
        """multi-chip forward step over the mesh. iq: (B, N) complex64,
        batch sharded over the batch axis (if present in the mesh) and time
        sharded over the time axis."""
        if self.mesh is None:
            raise ValueError('construct WidebandMonitor with a mesh to use sharded_step')

        has_batch = self.batch_axis in self.mesh.shape

        in_spec = P(self.batch_axis if has_batch else None, self.time_axis)
        stat_spec = P(self.batch_axis if has_batch else None)
        out_specs = {
            'channel_power': P(
                self.batch_axis if has_batch else None, self.time_axis
            ),
            'channel_power_mean': stat_spec,
            'channel_power_max': stat_spec,
            'psd_mean': stat_spec,
            'psd_max': stat_spec,
            'apd_counts': stat_spec,
        }

        def body(x_local):
            return jax.vmap(lambda row: self._body_1d(row, self.time_axis))(x_local)

        # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
        # annotation, which the default vma check rejects inside shard_map
        fn = jax.shard_map(
            body, mesh=self.mesh, in_specs=in_spec, out_specs=out_specs,
            check_vma=False,
        )
        return fn(iq)

    def profile_step(self, iq, *, reps: int = 3):
        """one-command stage attribution for :meth:`step` (debug tool).

        Times nested prefixes of the pipeline as separate jit programs —
        the OLA resample stage alone, then the full step — and attributes
        the difference to the channelizer+statistics+APD stage. Each
        prefix reduces to a small float32 vector and is fenced through a
        host readback (axon's ``block_until_ready`` returns at dispatch).

        Returns a :class:`iqwaveform_tpu.utils.profiling.StageTimer`
        whose ``report()`` prints the breakdown. Each prefix is
        difference-timed ((time of 1+reps executions) - (time of 1)) so
        the fixed per-dispatch cost — a few ms of tunnel round trip on
        axon, which otherwise dwarfs a ~5 ms stage — cancels out of the
        per-execution estimate. For publication-grade numbers use a
        large ``iq`` and median-of-trials (scripts/profile_stages.py);
        this method is the quick in-session view.
        """
        import time

        from ..utils.dispatch import unpack_iq
        from ..utils.profiling import StageTimer

        # packed (2, N) float32 planes are accepted (and preferred on the
        # axon tunnel, which cannot H2D complex64): complex is rebuilt
        # inside each jitted prefix
        packed_planes = (
            iq.ndim == 2
            and iq.shape[0] == 2
            and not jnp.iscomplexobj(iq)
        )
        if iq.ndim != 1 and not packed_planes:
            raise ValueError(
                'profile_step profiles a single capture: 1-D complex iq '
                'or (2, N) float32 planes'
            )
        n_samples = iq.shape[-1]
        maybe_unpack = unpack_iq if packed_planes else (lambda v: v)

        def _reduce(x):
            if jnp.iscomplexobj(x):
                x = x.real * x.real + x.imag * x.imag
            return jnp.broadcast_to(x.astype(jnp.float32).sum()[None], (8,))

        packed = self._packed_applies(n_samples)

        def ola_only(x):
            if packed:
                # _packed_resample consumes (2, N) planes, not complex
                planes = x if packed_planes else jnp.stack([x.real, x.imag])
                y = self._packed_resample(planes, None)
            else:
                x = maybe_unpack(x)
                d = self.design
                y = _sharded_ola_body(
                    x,
                    w_in=self._w_in,
                    w_shift_out=self._w_shift_out,
                    nfft=d.nfft,
                    nfft_out=d.nfft_out,
                    noverlap_in=self.noverlap_in,
                    noverlap_out=self.noverlap_out,
                    bounds_in=self._bounds_in,
                    bounds_out=self._bounds_out,
                    zero_lo=self._zero_lo,
                    zero_hi=self._zero_hi,
                    axis_name=None,
                    fft_fn=self._fft,
                    ifft_fn=self._ifft,
                    fused_fn=self._fused_ola,
                    fused_raw_fn=self._fused_ola_raw,
                    input_scale=d.input_scale,
                )
            return _reduce(y)

        def full(x):
            out = self._body_1d(maybe_unpack(x), None)
            tot = sum(
                leaf.astype(jnp.float32).sum()
                for leaf in jax.tree_util.tree_leaves(out)
            )
            return jnp.broadcast_to(tot[None], (8,))

        def _measure(fn):
            g = jax.jit(fn)
            np.asarray(g(iq))  # compile + warm (readback fences the queue)

            def run(n):
                t0 = time.perf_counter()
                out = None
                for _ in range(n):
                    out = g(iq)
                np.asarray(out)
                return time.perf_counter() - t0

            run(1)  # warm the dispatch path
            # difference timing cancels the fixed dispatch+readback cost;
            # median of 3 trial pairs per the repo timing rule (a hiccup
            # in the subtracted term biases a single pair fast)
            dts = []
            for _ in range(3):
                lo = run(1)
                hi = run(1 + reps)
                dts.append((hi - lo) / reps)
            # floor at 1 ns: "below measurement resolution", keeps
            # durations positive for reports and assertions
            return max(float(np.median(dts)), 1e-9)

        t_ola = _measure(ola_only)
        t_full = _measure(full)
        timer = StageTimer()
        timer.durations['ola_resample'] = t_ola
        timer.durations['chan_stats_apd'] = max(t_full - t_ola, 0.0)
        return timer

    # ---- streaming accumulation over long captures ----
    #
    # chunk-exact streaming: chunk k is processed when chunk k+1 arrives,
    # so the STFT framing sees the true noverlap_in-sample right halo, and
    # the ISTFT overlap-add tail (noverlap_out samples) carries into the
    # next chunk's head. statistics therefore match the one-shot step()
    # exactly (up to the final capture tail, which flush() zero-extends —
    # the same 'extend' semantics as step()).

    def _ola_chunk(self, x, halo, tail_in):
        """OLA resample of one chunk with explicit right halo and
        overlap-add tail carry. Returns (y_chunk, tail_out)."""
        d = self.design
        hop_in = self.hop_in
        hop_out = d.nfft_out - self.noverlap_out
        n_frames = x.shape[0] // hop_in

        x_ext = jnp.concatenate([x, halo]) if self.noverlap_in > 0 else x
        frames = _local_frames(x_ext, d.nfft, hop_in, n_frames)
        wind = (self._w_in / jnp.abs(self._w_in[:: hop_in]).sum()).astype(
            frames.dtype
        )
        Y = self._fft(frames * wind[None, :], axis=1)

        if self._zero_lo > 0:
            Y = Y.at[:, : self._zero_lo].set(0)
        if self._zero_hi is not None and self._zero_hi < d.nfft:
            Y = Y.at[:, self._zero_hi :].set(0)

        if d.nfft_out != d.nfft:
            if d.nfft_out < d.nfft:
                ysel = Y[:, self._bounds_in[0] : self._bounds_in[1]]
                if tuple(self._bounds_out) == (0, d.nfft_out):
                    Y = ysel
                else:
                    Y = jnp.zeros(Y.shape[:1] + (d.nfft_out,), dtype=Y.dtype)
                    Y = Y.at[:, self._bounds_out[0] : self._bounds_out[1]].set(ysel)
            else:
                pad_l = (d.nfft_out - d.nfft) // 2
                Y = jnp.pad(Y, ((0, 0), (pad_l, d.nfft_out - d.nfft - pad_l)))

        xstack = self._ifft(Y, axis=1) * self._w_shift_out[None, :]

        R = d.nfft_out // hop_out
        S_out = n_frames * hop_out
        out_len = S_out + self.noverlap_out
        xr = jnp.zeros((out_len,), dtype=xstack.dtype)
        for offs in range(R):
            group = xstack[offs::R].reshape(-1)
            start = offs * hop_out
            length = min(group.shape[0], out_len - start)
            xr = xr.at[start : start + length].add(group[:length])

        if self.noverlap_out > 0:
            xr = xr.at[: self.noverlap_out].add(tail_in)
            tail_out = xr[S_out:]
        else:
            tail_out = tail_in
        return xr[:S_out], tail_out

    def _chunk_stats(self, y):
        """channelizer + statistics of one resampled chunk.

        Per-chunk counts are exact: int32 histogram bins cast to
        integer-valued float32 (chunks are far below 2**24 samples per
        bin); the carry folds them exactly via utils.numerics.counter_fold
        so arbitrarily long captures never saturate float32."""
        channel_power, psd_dB_sum, psd_dB_max, apd, n_frames = self._chan_apd(y)
        return {
            'channel_power_sum': channel_power.sum(axis=0),
            'channel_power_max': channel_power.max(axis=0),
            'psd_sum': psd_dB_sum,
            'psd_max': psd_dB_max,
            'apd_counts': apd.astype(jnp.float32),
            'n_frames': jnp.asarray(float(n_frames), jnp.float32),
        }

    def init_carry(self, chunk_samples: int):
        """zeroed accumulator for accumulate_step. ``chunk_samples`` is the
        fixed chunk length (a multiple of min_input_multiple())."""
        d = self.design
        return {
            'pending': jnp.zeros((chunk_samples,), jnp.complex64),
            'started': jnp.zeros((), jnp.float32),
            'tail_out': jnp.zeros((self.noverlap_out,), jnp.complex64),
            'channel_power_sum': jnp.zeros((d.channel_count,), jnp.float32),
            'channel_power_max': jnp.full(
                (d.channel_count,), -jnp.inf, jnp.float32
            ),
            'psd_sum': jnp.zeros((self._nfft_big,), jnp.float32),
            'psd_max': jnp.full((self._nfft_big,), -jnp.inf, jnp.float32),
            # exact wide counters as float32 (hi, lo) pairs — see
            # utils.numerics.counter_fold (x64 is disabled and axon D2H
            # is float32-only, so int64 is not an option)
            'apd_counts_hi': jnp.zeros((d.apd_bins + 1,), jnp.float32),
            'apd_counts_lo': jnp.zeros((d.apd_bins + 1,), jnp.float32),
            'n_frames_hi': jnp.zeros((), jnp.float32),
            'n_frames_lo': jnp.zeros((), jnp.float32),
        }

    def _fold(self, carry, delta, weight):
        from ..utils.numerics import counter_fold

        apd_hi, apd_lo = counter_fold(
            carry['apd_counts_hi'],
            carry['apd_counts_lo'],
            weight * delta['apd_counts'],
        )
        nf_hi, nf_lo = counter_fold(
            carry['n_frames_hi'], carry['n_frames_lo'], weight * delta['n_frames']
        )
        return {
            'channel_power_sum': carry['channel_power_sum']
            + weight * delta['channel_power_sum'],
            'channel_power_max': jnp.maximum(
                carry['channel_power_max'],
                jnp.where(weight > 0, delta['channel_power_max'], -jnp.inf),
            ),
            'psd_sum': carry['psd_sum'] + weight * delta['psd_sum'],
            'psd_max': jnp.maximum(
                carry['psd_max'], jnp.where(weight > 0, delta['psd_max'], -jnp.inf)
            ),
            'apd_counts_hi': apd_hi,
            'apd_counts_lo': apd_lo,
            'n_frames_hi': nf_hi,
            'n_frames_lo': nf_lo,
        }

    def accumulate_step(self, carry, x_chunk):
        """fold one capture chunk into the running statistics.

        jit once and feed fixed-size chunks from io.iter_capture_chunks
        (or lax.scan over a device-resident capture) to analyze
        arbitrarily long captures at fixed memory — the monitor-level
        counterpart of parallel.streaming (BASELINE configs #3/#5).
        Processing is delayed by one chunk so framing sees true halos;
        call flush() after the last chunk.
        """
        halo = x_chunk[: self.noverlap_in]
        y, tail_out = self._ola_chunk(carry['pending'], halo, carry['tail_out'])
        delta = self._chunk_stats(y)

        stats = self._fold(carry, delta, carry['started'])
        return {
            **stats,
            'pending': x_chunk,
            'started': jnp.ones((), jnp.float32),
            # a never-started carry keeps a zero tail
            'tail_out': tail_out * carry['started'].astype(tail_out.dtype),
        }

    def flush(self, carry):
        """process the final pending chunk (zero-extended) and return the
        statistics dict (same keys as step() statistics)."""
        from ..utils.numerics import counter_value

        halo = jnp.zeros((self.noverlap_in,), jnp.complex64)
        y, _ = self._ola_chunk(carry['pending'], halo, carry['tail_out'])
        delta = self._chunk_stats(y)
        stats = self._fold(carry, delta, carry['started'])

        n_frames = counter_value(stats['n_frames_hi'], stats['n_frames_lo'])
        n = jnp.maximum(n_frames, 1.0)
        return {
            'channel_power_mean': stats['channel_power_sum'] / n,
            'channel_power_max': stats['channel_power_max'],
            'psd_mean': stats['psd_sum'] / n,
            'psd_max': stats['psd_max'],
            # float32 readout (exact below 2**24 per bin, nearest-f32
            # above — the axon D2H constraint applies here)
            'apd_counts': counter_value(
                stats['apd_counts_hi'], stats['apd_counts_lo']
            ),
        }

    def min_input_multiple(self, n_time_shards: int = 1) -> int:
        """smallest time length quantum: every shard must hold whole OLA
        hops AND produce whole channelizer frames."""
        d = self.design
        # hop_in samples in -> hop_out samples out; channel frame needs
        # nfft_big output samples
        import math

        hop_out = d.nfft_out - self.noverlap_out
        lcm_out = math.lcm(hop_out, self._nfft_big)
        per_shard_in = lcm_out * self.hop_in // hop_out
        # whole frame groups per shard (n_frames % R == 0) unlock the
        # gather-free grouped OLA path in parallel.sharded
        per_shard_in = math.lcm(per_shard_in, d.nfft)
        return per_shard_in * n_time_shards
