"""Crash-robustness fuzz of the public API on adversarial-but-legal input.

Parity harnesses (scripts/fuzz_parity.py, scripts/fuzz_vs_reference.py)
check numbers on well-formed input. This harness drives the public
entry points with hostile-but-constructible arguments — size-0/1
arrays, ndim 1-3, float16/int16 dtypes, negative axes, non-contiguous
and Fortran-ordered views, parameter combinations near design limits —
and asserts every call either returns or raises a DELIBERATE error
(ValueError/TypeError/NotImplementedError with a message).

Accidental error classes (IndexError, AttributeError, KeyError,
UnboundLocalError, ZeroDivisionError) fail the fuzz: those are the
crash classes the reference is riddled with (docs/PARITY.md) and the
rewrite must not regrow them.

Usage: python scripts/fuzz_robustness.py [N_CASES] [SEED]
Runs host-only (never touches the TPU tunnel).
"""

import os
import sys
import traceback
import zlib

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')

import iqwaveform_tpu as iqt
from iqwaveform_tpu import ofdm, power_analysis as pa

DELIBERATE = (ValueError, TypeError, NotImplementedError)
# error classes that indicate an internal crash rather than validation
ACCIDENTAL = (
    IndexError,
    AttributeError,
    KeyError,
    UnboundLocalError,
    ZeroDivisionError,
)


def _adversarial_array(rng, allow_complex=True):
    """a legal ndarray with hostile size/dtype/layout."""
    ndim = int(rng.integers(1, 4))
    sizes = [0, 1, 2, 3, 7, 16, 127, 128]
    shape = tuple(int(rng.choice(sizes)) for _ in range(ndim))
    dtypes = ['float32', 'float64', 'float16', 'int16']
    if allow_complex:
        dtypes += ['complex64', 'complex128']
    dtype = str(rng.choice(dtypes))
    x = rng.standard_normal(shape)
    if dtype.startswith('complex'):
        x = x + 1j * rng.standard_normal(shape)
    elif dtype == 'int16':
        x = (x * 100).astype('int64')
    x = x.astype(dtype)
    layout = int(rng.integers(0, 3))
    if layout == 1 and x.ndim >= 2:
        x = np.asfortranarray(x)
    elif layout == 2 and x.shape and x.shape[-1] >= 2:
        pad_shape = x.shape[:-1] + (2 * x.shape[-1],)
        big = np.zeros(pad_shape, x.dtype)
        big[..., ::2] = x
        x = big[..., ::2]  # non-contiguous view with the same values
    return x


def _axis_for(rng, x):
    if x.ndim == 0:
        return 0
    return int(rng.integers(-x.ndim, x.ndim))


def _call(fn, *args, allowed=(), **kws):
    """call fn; return normally for a result or a DELIBERATE error.

    ``allowed``: extra exception types this entry point DOCUMENTS
    (e.g. to_blocks raises IndexError for size-0 input — reference
    util.py docstring parity)."""
    try:
        out = fn(*args, **kws)
    except tuple(allowed):
        return None
    except DELIBERATE as err:
        if isinstance(err, ACCIDENTAL):
            # e.g. a KeyError subclass smuggled through — still a crash
            raise
        if not str(err):
            raise AssertionError(
                f'{getattr(fn, "__name__", fn)}: empty {type(err).__name__} message'
            )
        return None
    except ACCIDENTAL as err:
        raise AssertionError(
            f'{getattr(fn, "__name__", fn)}: internal '
            f'{type(err).__name__}: {err}'
        )
    return out


def fuzz_db_ops(rng):
    x = _adversarial_array(rng)
    for fn in (pa.envtodB, pa.powtodB, pa.envtopow, pa.dBtopow):
        _call(fn, x)


def fuzz_framing_ops(rng):
    x = _adversarial_array(rng)
    axis = _axis_for(rng, x)
    # IndexError for size-0 input is the documented reference contract
    _call(
        iqt.util.to_blocks, x, int(rng.integers(0, 9)), axis=axis,
        allowed=(IndexError,) if x.size == 0 else (),
    )
    _call(iqt.util.sliding_window_view, x, int(rng.integers(0, 9)), axis=axis)
    _call(
        iqt.util.pad_along_axis,
        x,
        [(int(rng.integers(0, 5)), int(rng.integers(0, 5)))],
        axis=axis,
    )
    _call(iqt.util.axis_slice, x, 0, int(rng.integers(0, 9)), axis=axis)
    _call(iqt.util.binned_mean, x.real, int(rng.integers(0, 9)), axis=axis)


def fuzz_stft_ops(rng):
    x = _adversarial_array(rng)
    nperseg = int(rng.choice([0, 1, 7, 64, 129]))
    noverlap = int(rng.choice([0, 1, nperseg // 2 if nperseg else 0, nperseg]))
    window = str(rng.choice(['hamming', 'hann', 'boxcar']))
    axis = _axis_for(rng, x)
    _call(
        iqt.fourier.stft,
        x,
        fs=1e6,
        window=window,
        nperseg=nperseg,
        noverlap=noverlap,
        axis=axis,
    )
    _call(
        iqt.fourier.spectrogram,
        x,
        fs=1e6,
        window=window,
        nperseg=max(nperseg, 1),
        noverlap=0,
        axis=axis,
    )


def fuzz_resample_ops(rng):
    x = _adversarial_array(rng)
    axis = _axis_for(rng, x)
    num = int(rng.choice([0, 1, 2, 7, 33, 128]))
    _call(iqt.fourier.resample, x, num, axis=axis)
    h = rng.standard_normal(int(rng.choice([0, 1, 5, 17]))).astype('float32')
    _call(
        iqt.fourier.upfirdn,
        h,
        x,
        up=int(rng.integers(0, 4)),
        down=int(rng.integers(0, 4)),
        axis=axis,
    )


def fuzz_filter_ops(rng):
    x = _adversarial_array(rng)
    nfft = int(rng.choice([0, 2, 64, 254, 256]))
    fs = 1e6
    lo = float(rng.uniform(-0.6, 0.0)) * fs
    hi = float(rng.uniform(0.0, 0.6)) * fs
    _call(
        iqt.fourier.ola_filter,
        x,
        fs=fs,
        nfft=nfft,
        window=str(rng.choice(['hamming', 'blackman'])),
        passband=(lo, hi),
    )


def fuzz_power_ops(rng):
    x = _adversarial_array(rng)
    Ts = float(rng.choice([1e-6, 1e-3]))
    nbin = int(rng.integers(0, 9))
    _call(pa.iq_to_bin_power, x, Ts=Ts, Tbin=nbin * Ts)
    _call(
        pa.iq_to_cyclic_power,
        x,
        Ts=Ts,
        detector_period=max(nbin, 1) * Ts,
        cyclic_period=4 * max(nbin, 1) * Ts,
        truncate=bool(rng.integers(0, 2)),
    )
    p = np.abs(_adversarial_array(rng, allow_complex=False))
    edges = np.linspace(0, 1, int(rng.choice([0, 1, 2, 33])))
    _call(pa.sample_ccdf, p, edges)
    if p.ndim >= 1:
        _call(pa.histogram_last_axis, p, max(int(rng.integers(0, 17)), 1))


def fuzz_design_ops(rng):
    _call(
        iqt.fourier.design_cola_resampler,
        fs_base=float(rng.choice([1e6, 122.88e6, 0.0])),
        fs_target=float(rng.choice([1e5, 10e6, -1.0])),
        bw=float(rng.choice([1e5, np.inf, 0.0])),
        window=str(rng.choice(['hamming', 'blackman'])),
    )
    _call(
        iqt.fourier.equivalent_noise_bandwidth,
        str(rng.choice(['hamming', 'hann'])),
        int(rng.choice([0, 1, 2, 64])),
    )


def fuzz_ofdm_ops(rng):
    _call(
        ofdm.Phy3GPP,
        channel_bandwidth=float(rng.choice([1.4e6, 2e6, 10e6, 1e3])),
        subcarrier_spacing=float(rng.choice([15e3, 30e3, 17e3])),
    )
    x = _adversarial_array(rng)
    if x.ndim == 1 and np.iscomplexobj(x):
        nfft = int(rng.choice([4, 16, 64]))
        inds = np.arange(0, max(x.size - 2 * nfft, 0), max(nfft // 2, 1))[:4]
        if inds.size:
            _call(ofdm.corr_at_indices, inds, x, nfft)


def fuzz_istft_ops(rng):
    x = _adversarial_array(rng)
    nfft = int(rng.choice([0, 2, 64, 127, 128]))
    noverlap = int(rng.choice([0, 1, nfft // 2 if nfft else 0]))
    _call(iqt.fourier.istft, x, nfft=nfft, noverlap=noverlap)


def fuzz_spectral_ops(rng):
    x = _adversarial_array(rng)
    fs = 1e6
    _call(
        iqt.fourier.power_spectral_density,
        x,
        fs=fs,
        window='hann',
        resolution=float(rng.choice([fs / 64, fs / 127, fs / 3.5, 0.0])),
        statistics=[s for s in ('mean', 0.5, 'max')][: int(rng.integers(0, 4))],
    )
    _call(
        iqt.fourier.channelize_power,
        x,
        1 / fs,
        int(rng.choice([0, 2, 32, 64])),
        analysis_bins_per_channel=int(rng.choice([0, 16, 32, 100])),
        window='hamming',
        channel_count=int(rng.choice([0, 1, 4])),
    )
    f, Y = None, None
    if x.ndim == 2 and x.size and np.iscomplexobj(x):
        f = np.linspace(-fs / 2, fs / 2, x.shape[1], endpoint=False)
        _call(
            iqt.fourier.downsample_stft,
            f, x, nfft_out=int(rng.choice([0, 1, x.shape[1] // 2 or 1])),
            passband=(-fs / 4, fs / 4),
        )


def fuzz_oa_ops(rng):
    x = _adversarial_array(rng)
    h = rng.standard_normal(int(rng.choice([0, 1, 9]))).astype('float32')
    _call(
        iqt.fourier.oaconvolve, x, h,
        mode=str(rng.choice(['full', 'same', 'valid', 'bogus'])),
    )
    if x.ndim == 2:
        _call(
            iqt.fourier.oaresample, x,
            up=int(rng.integers(0, 4)), down=int(rng.integers(0, 4)),
            fs=1e6, axis=1,
        )


def fuzz_monitor_design(rng):
    from iqwaveform_tpu.models import design_wideband_monitor

    _call(
        design_wideband_monitor,
        float(rng.choice([122.88e6, 1e6, 0.0])),
        float(rng.choice([61.44e6, 10e6, -1.0])),
        bw=float(rng.choice([40e6, 1e5, 0.0])),
        channel_count=int(rng.choice([0, 1, 16])),
        fft_size_per_channel=int(rng.choice([0, 8, 256])),
        window=str(rng.choice(['hamming', 'blackman'])),
        apd_bins=int(rng.choice([0, 2, 2048])),
    )


def fuzz_streaming_ops(rng):
    from iqwaveform_tpu import parallel

    x = _adversarial_array(rng)
    if x.ndim != 1:
        return
    edges = np.linspace(0, 1, int(rng.choice([0, 1, 2, 33]))).astype('float32')
    _call(
        parallel.streaming_apd,
        x,
        edges=edges,
        chunk_size=int(rng.choice([0, 1, 100, 8192])),
        navg=int(rng.choice([0, 1, 7])),
    )


def fuzz_io_ops(rng):
    import json
    import os
    import tempfile

    x = _adversarial_array(rng)
    _call(iqt.io.waveform_to_frame, x, Ts=float(rng.choice([1e-6, 0.0])))

    # malformed metadata: missing keys, empty captures, bad payload size
    variant = int(rng.integers(0, 4))
    meta = {
        'global': {'core:sample_rate': 1e6},
        'captures': [
            {'core:sample_start': 0, 'core:frequency': 1e9, 'core:datetime': 't'}
        ],
        'annotations': [],
    }
    if variant == 1:
        meta['captures'] = []
    elif variant == 2:
        del meta['global']['core:sample_rate']
    elif variant == 3:
        del meta['captures'][0]['core:frequency']
    with tempfile.TemporaryDirectory() as d:
        mp = os.path.join(d, 'cap.sigmf-meta')
        with open(mp, 'w') as fd:
            json.dump(meta, fd)
        np.save(
            os.path.join(d, 'cap.sigmf-data.npy'),
            np.zeros(int(rng.choice([0, 8])), 'complex64'),
        )
        # missing keys are metadata-format errors: KeyError is the
        # documented-enough outcome for malformed files; crashes we
        # reject are the unbound/zero-division classes
        _call(iqt.io.read_sigmf, mp, allowed=(KeyError,))


FUZZERS = [
    fuzz_db_ops,
    fuzz_framing_ops,
    fuzz_stft_ops,
    fuzz_resample_ops,
    fuzz_filter_ops,
    fuzz_power_ops,
    fuzz_design_ops,
    fuzz_ofdm_ops,
    fuzz_istft_ops,
    fuzz_spectral_ops,
    fuzz_oa_ops,
    fuzz_monitor_design,
    fuzz_streaming_ops,
    fuzz_io_ops,
]


def run(n_cases, seed, max_failures=20):
    failures = []
    for i in range(n_cases):
        for fz in FUZZERS:
            rng = np.random.default_rng(
                seed * 1_000_003
                + i * 997
                + zlib.crc32(fz.__name__.encode()) % 65536
            )
            try:
                fz(rng)
            except AssertionError as err:
                failures.append(f'[case {i}] {err}')
                print(failures[-1], flush=True)
            except DELIBERATE:
                pass  # top-level deliberate rejections are fine
            except Exception:
                failures.append(
                    f'[case {i}] {fz.__name__} CRASH:\n'
                    + traceback.format_exc(limit=8)
                )
                print(failures[-1], flush=True)
            if len(failures) >= max_failures:
                return failures
        if (i + 1) % 20 == 0:
            print(f'{i + 1}/{n_cases} cases ok so far', flush=True)
    return failures


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    failures = run(n_cases, seed)
    if failures:
        print(f'{len(failures)} failures')
        sys.exit(1)
    print(
        f'robustness fuzz: {n_cases} cases x {len(FUZZERS)} fuzzers all passed'
    )


if __name__ == '__main__':
    main()
