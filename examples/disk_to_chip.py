"""End-to-end disk -> chip throughput demonstration (VERDICT r2 #8).

Synthesizes a multi-GB SigMF ci16 recording on disk, then streams it
through the library's streaming reductions and reports SUSTAINED MS/s
including ingest — the full production path, not a device-resident
benchmark:

    disk (SigMF ci16) -> CapturePrefetcher (native mmap + threaded
    deinterleave, overlapped with compute) -> H2D -> persistence fold
    (fused spectrogram/histogram kernels) + detector-binned APD fold

Modes:
  default          float32 planes -> parallel.streaming persistence +
                   APD folds (the BASELINE config-#3 composition, fed
                   from disk)
  --monitor-i16    raw int16 chunks shipped to the device at HALF the
                   transfer size, deinterleaved on-device, and fed to
                   WidebandMonitor.step_planes at the fft_precision=
                   'i16' tier (lossless for ci16: the ADC scale folds
                   into the kernel window)

Run:  python examples/disk_to_chip.py [--gigasamples G] [--monitor-i16]
      (CPU by default; EXAMPLE_ON_TPU=1 runs on the attached chip.)

Reference context: the reference loads whole captures in one read
(io.py:58-96) and has no streaming reader; this pipeline is the C5
chunking role (SURVEY.md §2) scaled to captures larger than memory.
"""

import argparse
import os
import sys
import tempfile
import time

import jax

if not os.environ.get('EXAMPLE_ON_TPU'):
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from iqwaveform_tpu import io
from iqwaveform_tpu.parallel.streaming import (
    apd_fold,
    design_persistence,
    persistence_finalize,
    persistence_fold,
    persistence_init,
)
from iqwaveform_tpu.utils import unpack_iq

FS = 122.88e6
CHUNK = 2**24  # 16.78 Ms per fold (override with --chunk-log2)


def synthesize(path: str, n_samples: int) -> None:
    """write an n_samples SigMF ci16 recording in bounded memory."""
    rng = np.random.default_rng(0)
    block = 2**22
    t0 = time.perf_counter()
    with open(path, 'wb') as f:
        written = 0
        while written < n_samples:
            m = min(block, n_samples - written)
            t = (np.arange(written, written + m) / FS)
            x = 0.3 * np.exp(2j * np.pi * 10e6 * t)
            x += 0.05 * (
                rng.standard_normal(m) + 1j * rng.standard_normal(m)
            )
            q = np.empty((m, 2), dtype='<i2')
            q[:, 0] = np.clip(np.round(x.real * 8192), -32768, 32767)
            q[:, 1] = np.clip(np.round(x.imag * 8192), -32768, 32767)
            f.write(q.tobytes())
            written += m
    gb = n_samples * 4 / 1e9
    print(
        f'synthesized {gb:.2f} GB ci16 in {time.perf_counter() - t0:.1f}s',
        flush=True,
    )


def run_persistence(path: str, n_chunks: int) -> float:
    """disk -> f32 planes -> persistence + APD folds; returns MS/s."""
    nfft = 1024
    design = design_persistence(
        nfft=nfft, window='hann', hist_bins=1024,
        fft_backend='pallas', fft_precision='high',
    )
    apd_edges = (10 ** (np.linspace(-120.0, 30.0, 513) / 10.0)).astype(
        'float32'
    )

    @jax.jit
    def fold(carry, planes):
        pcarry, apd = carry
        v = unpack_iq(planes)
        return (
            persistence_fold(pcarry, v, design),
            apd_fold(apd, v, edges=apd_edges, navg=16, kernel='auto'),
        )

    carry = (
        persistence_init(design),
        jnp.zeros((apd_edges.shape[0] + 1,), jnp.int32),
    )

    # compile OUTSIDE the sustained window (the first call's remote
    # compile is minutes on the axon tunnel and would swamp a short
    # capture's rate — the round-5 session-1 `0.0 MS/s` artifact);
    # fence on a jit-produced f32 (axon: block_until_ready returns at
    # dispatch, int32 D2H is unimplemented)
    warm = fold(carry, jnp.zeros((2, CHUNK), jnp.float32))
    np.asarray(warm[0].psum)

    t0 = time.perf_counter()
    done = 0
    with io.CapturePrefetcher(
        path, CHUNK, 'ci16_le', planes=True
    ) as chunks:
        for planes in chunks:
            carry = fold(carry, jnp.asarray(planes))
            done += 1
            if done >= n_chunks:
                break
    np.asarray(carry[0].psum)  # fence
    dt = time.perf_counter() - t0

    out = persistence_finalize(carry[0], design, fs=FS)
    peak_bin = int(np.asarray(out['max_dB']).argmax())
    peak_freq = float(out['freqs'][peak_bin])
    print(f'persistence peak at {peak_freq / 1e6:+.2f} MHz '
          f'(expect +10 MHz)', flush=True)
    assert abs(peak_freq - 10e6) < 2 * FS / nfft, peak_freq
    return done * CHUNK / dt / 1e6


def run_monitor_i16(path: str, n_chunks: int) -> float:
    """disk -> raw int16 chunks -> on-device deinterleave ->
    WidebandMonitor.step_planes at the 'i16' tier; returns MS/s."""
    from iqwaveform_tpu.models import (
        WidebandMonitor,
        design_wideband_monitor,
    )

    design = design_wideband_monitor(
        FS, FS / 2, bw=40e6, fs_sdr=FS, channel_count=16,
        fft_size_per_channel=256, window='hamming', apd_bins=2048,
        apd_navg=16, fft_backend='mxu', ola_kernel='pallas',
        apd_kernel='pallas', chan_kernel='pallas',
        fft_precision='i16', input_scale=1.0 / 8192, min_fft_size=8191,
    )
    mon = WidebandMonitor(design)
    quantum = mon.min_input_multiple()
    # round to the monitor quantum; a small --chunk-log2 rounds UP so
    # the flag can never produce a zero-length chunk
    chunk = max((CHUNK // quantum) * quantum, quantum)

    # per-chunk step_planes with the running merge INSIDE the jit
    # program (axon rule: no eager ops; fence by reading jit-produced
    # f32). Each 16.8 Ms chunk is zero-extended at its boundary (the
    # ~8k-sample OLA halo — a 5e-4 fraction; use accumulate_step for
    # boundary-exact streaming).
    @jax.jit
    def step(acc, raw):
        # raw (chunk, 2) int16 straight from disk: deinterleave on the
        # device (a transpose fused into the kernel feed); H2D moves
        # half the bytes of the float32 plane path
        out = mon.step_planes(raw.T)
        psd_sum, psd_max, apd = acc
        return (
            psd_sum + out['psd_mean'],
            jnp.maximum(psd_max, out['psd_max']),
            apd + out['apd_counts'].astype(jnp.float32),
        )

    raw_map = np.memmap(path, dtype='<i2', mode='r').reshape(-1, 2)

    nfft_big = design.fft_size_per_channel * design.channel_count
    acc = (
        jnp.zeros((nfft_big,), jnp.float32),
        jnp.full((nfft_big,), -jnp.inf, jnp.float32),
        jnp.zeros((design.apd_bins + 1,), jnp.float32),
    )
    # compile outside the sustained window (see run_persistence)
    warm = step(acc, jnp.zeros((chunk, 2), jnp.int16))
    np.asarray(warm[0])

    t0 = time.perf_counter()
    done = 0
    for k in range(min(n_chunks, raw_map.shape[0] // chunk)):
        raw = np.ascontiguousarray(raw_map[k * chunk : (k + 1) * chunk])
        acc = step(acc, jnp.asarray(raw))
        done += 1
    psd_mean = np.asarray(acc[0]) / max(done, 1)  # f32 fence
    dt = time.perf_counter() - t0
    print(f'monitor psd peak bin {int(psd_mean.argmax())}, '
          f'APD total {int(np.asarray(acc[2]).sum())}', flush=True)
    return done * chunk / dt / 1e6


def main():
    global CHUNK
    ap = argparse.ArgumentParser()
    ap.add_argument('--gigasamples', type=float, default=0.5)
    ap.add_argument('--monitor-i16', action='store_true')
    ap.add_argument('--out-dir', default=None)
    ap.add_argument(
        '--chunk-log2', type=int, default=24,
        help='samples per fold as a power of two (small values keep CI '
        'runs fast; throughput numbers are meaningful at the default)',
    )
    args = ap.parse_args()
    CHUNK = 2 ** args.chunk_log2

    out_dir = args.out_dir or tempfile.mkdtemp()
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, 'capture.sigmf-data')

    n = int(args.gigasamples * 1e9)
    n_chunks = n // CHUNK
    n = n_chunks * CHUNK
    if not (os.path.exists(path) and os.stat(path).st_size >= n * 4):
        synthesize(path, n)

    if args.monitor_i16:
        msps = run_monitor_i16(path, n_chunks)
        mode = 'monitor-i16'
    else:
        msps = run_persistence(path, n_chunks)
        mode = 'persistence'

    rt = msps * 1e6 / FS
    print(
        f'disk->chip [{mode}]: {n / 1e9:.2f} GS sustained '
        f'{msps:.2f} MS/s including ingest ({rt:.1f}x real time at '
        f'{FS / 1e6:.2f} MS/s)',
        flush=True,
    )


if __name__ == '__main__':
    main()
