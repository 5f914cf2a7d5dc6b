"""Roofline / MFU accounting for the flagship pipelines on one v5e chip
(VERDICT r4 #5).

Measures per-stage times with the difference-timing discipline
(scripts/_timing.py) and combines them with analytic work models —
bf16-equivalent MXU FLOPs from each kernel's documented dot structure,
and the HBM bytes each stage necessarily moves — to report achieved
TFLOP/s and GB/s against v5e peaks and classify each stage's binding
resource (MXU passes, HBM bandwidth, or dispatch/VPU floor).

Work models (all per 2^24-sample step at bench shapes, 'high' tier):
* OLA (fused_ola_strided kernel, nfft 16384->8192, hop 8192):
  3 complex-matmul stages (Fa, H0, Fa_inv; a=b=b2p=128), each Gauss
  3-multiplication x 3-pass hi/lo bf16 split -> 9 bf16 dots of 128^3
  MACs per stage per frame (ops/pallas/fused_ola_pallas.py).
* channelizer+stats (chan_stats kernel, nfft_big=4096, a=32, b=128):
  four-step per frame = a^2 b + a b^2 complex MACs, same Gauss/3-pass
  multiplier, plus ~3 full-width f32 group/channel dots per frame
  (ops/pallas/chan_stats_pallas.py).
* APD: navg=16 detector binning emitted by the chan kernel; the
  edge-compare histogram reads n_res/navg values (hist_pallas).
* spectrogram fold (spectrogram_pallas, nfft=1024, a=8, b=128): same
  four-step model; the dB stage adds one log per sample on the VPU.
* streaming fold: spectrogram + levels quantize + the slab-packed
  counting dots (hi/lo one-hot contractions: 2 x 128 MACs per binned
  value, pass-floor-bound by design — docs/DESIGN.md "pass floor").

HBM bytes count each array a stage must read/write exactly once
(VMEM-resident kernels touch inputs once; XLA stages may re-read, which
the table then shows as >100% apparent bandwidth, i.e. fused correctly).

Run: python scripts/roofline.py   (claims the TPU chip, ~10-15 min)
"""

import json
import sys

import numpy as np

from _timing import fence_vec as _fence_vec, measure

V5E_BF16_TFLOPS = 197.0  # MXU peak, bf16 x bf16 -> f32
V5E_HBM_GBS = 819.0


def gflop_fourstep(frames: int, a: int, b: int, gauss3pass=True) -> float:
    """bf16-equivalent GFLOPs of the factored four-step transform."""
    cmacs = frames * (a * a * b + a * b * b)
    mult = 9 if gauss3pass else 4  # Gauss(3) x 3-pass vs plain f32 4-dot
    return 2.0 * mult * cmacs / 1e9


def gflop_fused_ola(frames: int, a: int, b: int, b2p: int) -> float:
    cmacs = frames * (a * a * b + a * b * b2p + a * a * b2p)
    return 2.0 * 9 * cmacs / 1e9


def row(name, dt_s, gflops, gbytes, note=''):
    tf = gflops / dt_s / 1e3
    gbs = gbytes / dt_s
    f_mxu = tf / V5E_BF16_TFLOPS
    f_hbm = gbs / V5E_HBM_GBS
    if max(f_mxu, f_hbm) < 0.15:
        bound = 'dispatch/VPU'
    elif f_mxu >= f_hbm:
        bound = 'MXU-pass'
    else:
        bound = 'HBM'
    return {
        'stage': name,
        'ms': round(dt_s * 1e3, 2),
        'model_GFLOP_bf16': round(gflops, 1),
        'model_MB': round(gbytes * 1e3, 0),
        'TFLOPs': round(tf, 1),
        'GBs': round(gbs, 0),
        'pct_mxu_peak': round(100 * f_mxu, 1),
        'pct_hbm_peak': round(100 * f_hbm, 1),
        'bound': bound,
        'note': note,
    }


def main():
    import jax
    import jax.numpy as jnp

    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor
    from iqwaveform_tpu.utils import unpack_iq

    design = design_wideband_monitor(
        122.88e6, 61.44e6, bw=40e6, fs_sdr=122.88e6, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=2048,
        apd_navg=16, fft_backend='mxu', min_fft_size=8191,
        fft_precision='high', ola_kernel='pallas', apd_kernel='pallas',
        chan_kernel='pallas',
    )
    mon = WidebandMonitor(design)
    quantum = mon.min_input_multiple()
    n = int(np.ceil(2**24 / quantum)) * quantum
    n_res = n * design.nfft_out // design.nfft
    rng = np.random.default_rng(0)
    ri = jnp.asarray(
        np.stack([rng.standard_normal(n), rng.standard_normal(n)]).astype(
            'float32'
        )
    )

    # --- measured nested prefixes (profile_stages discipline) ---
    from iqwaveform_tpu.parallel.sharded import _sharded_ola_body

    def unpack_only(planes):
        return _fence_vec(unpack_iq(planes))

    def ola_only(planes):
        x = unpack_iq(planes)
        y = _sharded_ola_body(
            x, w_in=mon._w_in, w_shift_out=mon._w_shift_out,
            nfft=design.nfft, nfft_out=design.nfft_out,
            noverlap_in=mon.noverlap_in, noverlap_out=mon.noverlap_out,
            bounds_in=mon._bounds_in, bounds_out=mon._bounds_out,
            zero_lo=mon._zero_lo, zero_hi=mon._zero_hi,
            axis_name=None, fft_fn=mon._fft, ifft_fn=mon._ifft,
            fused_fn=mon._fused_ola, fused_raw_fn=mon._fused_ola_raw,
        )
        return _fence_vec(y * y.conj())

    def no_apd(planes):
        out = mon._body_1d(unpack_iq(planes), None)
        return _fence_vec(
            out['psd_mean'].sum() + out['channel_power'].sum()
            + out['psd_max'].sum()
        )

    def full(planes):
        out = mon._body_1d(unpack_iq(planes), None)
        total = (
            out['psd_mean'].sum() + out['psd_max'].sum()
            + out['channel_power_mean'].sum()
            + out['channel_power_max'].sum()
            + out['apd_counts'].astype('float32').sum()
            + out['channel_power'].sum()
        )
        return _fence_vec(total)

    times = {}
    for name, fn in [
        ('unpack', unpack_only), ('ola', ola_only),
        ('no_apd', no_apd), ('full', full),
    ]:
        dt, tc = measure(jax.jit(fn), ri)
        times[name] = dt
        print(f'{name:8s} {dt * 1e3:8.2f} ms [compile {tc:.0f}s]',
              file=sys.stderr, flush=True)

    # --- spectrogram + streaming folds ---
    from iqwaveform_tpu.parallel.streaming import (
        design_persistence,
        persistence_apd_fold,
        persistence_fold,
        persistence_init,
    )

    nfft_sg = 1024
    d_sg = design_persistence(
        nfft=nfft_sg, window='hann', hist_bins=0,
        fft_backend='pallas', fft_precision='high',
    )
    d_st = design_persistence(
        nfft=nfft_sg, window='hann', hist_bins=1024,
        fft_backend='pallas', fft_precision='high',
    )
    apd_edges = (10 ** (np.linspace(-120.0, 30.0, 513) / 10.0)).astype(
        'float32'
    )

    def sg_fold(planes):
        c = persistence_fold(persistence_init(d_sg), planes, d_sg)
        return _fence_vec(c.psum)

    def st_fold(planes):
        c, apd = persistence_apd_fold(
            persistence_init(d_st),
            jnp.zeros((apd_edges.shape[0] + 1,), jnp.int32),
            planes, d_st, apd_edges=apd_edges, apd_navg=16,
            apd_kernel='pallas',
        )
        return _fence_vec(c.psum + apd.astype(jnp.float32).sum())

    n_sg = 2**24
    ri_sg = ri[:, :n_sg]
    for name, fn in [('sg_fold', sg_fold), ('st_fold', st_fold)]:
        dt, tc = measure(jax.jit(fn), ri_sg)
        times[name] = dt
        print(f'{name:8s} {dt * 1e3:8.2f} ms [compile {tc:.0f}s]',
              file=sys.stderr, flush=True)

    # --- work models ---
    M = n // mon.hop_in  # OLA frames
    a_o, b_o, b2p = 128, 128, 128  # 16384 = 128*128; b2p pads 64->128
    frames_ch = n_res // mon._nfft_big
    a_c, b_c = mon._nfft_big // 128, 128
    frames_sg = n_sg // nfft_sg
    a_s, b_s = nfft_sg // 128, 128

    gf_ola = gflop_fused_ola(M, a_o, b_o, b2p)
    gb_ola = (2 * n * 4 + 2 * n_res * 4) / 1e9
    gf_chan = gflop_fourstep(frames_ch, a_c, b_c) + (
        # group-sum + channel one-hot f32 dots (~3 full-width per frame)
        2.0 * 3 * frames_ch * a_c * b_c * b_c / 1e9
    )
    gb_chan = (2 * n_res * 4) / 1e9
    gf_apd = 2.0 * (n_res / 16) * 2 * 128 / 1e9  # hi/lo edge compares
    gb_apd = (n_res / 16) * 4 / 1e9
    gf_sg = gflop_fourstep(frames_sg, a_s, b_s)
    gb_sg = (2 * n_sg * 4) / 1e9
    # streaming adds the counting dots: 2 x 128-MAC one-hot contractions
    # per (frame, bin) value (slab-packed; pass-floor applies)
    gf_st = gf_sg + 2.0 * frames_sg * nfft_sg * 2 * 128 / 1e9
    gb_st = gb_sg

    t_ola = times['ola'] - times['unpack']
    t_chan = times['no_apd'] - times['ola']
    t_apd = times['full'] - times['no_apd']

    rows = [
        row('h2d/unpack floor (measured)', times['unpack'], 0.0,
            (2 * n * 4 + 2 * n * 4) / 1e9, 'dispatch + one plane pass'),
        row('OLA resample (strided kernel)', t_ola, gf_ola, gb_ola),
        row('channelizer + stats kernel', t_chan, gf_chan, gb_chan),
        row('APD (binned hist kernel)', t_apd, gf_apd, gb_apd),
        row('full monitor step', times['full'],
            gf_ola + gf_chan + gf_apd, gb_ola + gb_chan + gb_apd,
            f'{n / times["full"] / 1e6:.0f} MS/s'),
        row('spectrogram stats fold', times['sg_fold'], gf_sg, gb_sg,
            f'{n_sg / times["sg_fold"] / 1e6:.0f} MS/s'),
        row('streaming persistence+APD fold', times['st_fold'], gf_st,
            gb_st, f'{n_sg / times["st_fold"] / 1e6:.0f} MS/s'),
    ]

    cols = list(rows[0].keys())
    print('| ' + ' | '.join(cols) + ' |')
    print('|' + '---|' * len(cols))
    for r in rows:
        print('| ' + ' | '.join(str(r[c]) for c in cols) + ' |')
    print(json.dumps(rows))


if __name__ == '__main__':
    main()
