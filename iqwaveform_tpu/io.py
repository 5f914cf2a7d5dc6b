"""Routines for reading spectrum monitoring data files.

Feature parity: reference io.py:1-152 (SigMF metadata/data reading, NTIA
calibration extraction, pandas framing, resample_iq).

The optional native fast path in ``native/`` (C, mmap-based) accelerates
bulk .sigmf-data loading + int16 -> complex64 conversion for the streaming
pipelines; this module falls back to numpy when it is not built.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from .utils import lazy_import

signal = lazy_import('scipy.signal')
pd = lazy_import('pandas')

try:
    from . import _iqio
except ImportError:  # extension not built: numpy fallback below
    _iqio = None

__all__ = [
    'CapturePrefetcher',
    'extract_ntia_calibration_metadata',
    'iter_capture_chunks',
    'read_iq_data',
    'read_iq_planes',
    'read_sigmf',
    'read_sigmf_metadata',
    'read_sigmf_to_df',
    'resample_iq',
    'waveform_to_frame',
    'write_sigmf',
]


# NTIA sensor annotation fields -> (output key, value transform)
_NTIA_CAL_FIELDS = {
    'ntia-sensor:temperature': ('ambient temperature (K)', lambda c: c + 273.15),
    'ntia-sensor:noise_figure_sensor': ('noise figure (dB)', lambda v: v),
    'ntia-sensor:gain_preselector': ('gain (dB)', lambda v: v),
}


def extract_ntia_calibration_metadata(metadata: dict) -> dict:
    """pull calibration values from an NTIA CalibrationAnnotation
    (reference io.py:13-32)."""
    cal = {key: None for key, _ in _NTIA_CAL_FIELDS.values()}

    annotations = (
        a
        for a in metadata['annotations']
        if a['ntia-core:annotation_type'] == 'CalibrationAnnotation'
    )
    for annotation in annotations:
        for field, (key, convert) in _NTIA_CAL_FIELDS.items():
            cal[key] = convert(annotation[field])
        break

    return cal


def read_sigmf_metadata(metadata_fn, ntia=False):
    """read capture table + sample rate (+ NTIA calibration) from SigMF
    metadata (reference io.py:35-55)."""
    metadata = json.loads(Path(metadata_fn).read_text())

    # {sample_start: value} maps for each capture field
    def by_start(field):
        return {
            c['core:sample_start']: c[f'core:{field}']
            for c in metadata['captures']
        }

    cal = extract_ntia_calibration_metadata(metadata) if ntia else {}

    return (
        by_start('frequency'),
        by_start('datetime'),
        metadata['global']['core:sample_rate'],
        cal,
    )


def _load_sigmf_payload(metadata_path: Path, data_ext: str) -> np.ndarray:
    """load the raw sample payload stored next to a .sigmf-meta file."""
    if data_ext != '.npy':
        raise TypeError(f'SIGMF data extension {data_ext} not supported')
    return np.load(metadata_path.with_suffix('.sigmf-data.npy'))


def _cut_at_capture_starts(x: np.ndarray, capture_starts, stack: bool):
    """cut the flat payload at each capture's sample_start offset; with
    ``stack`` the per-capture segments become columns of one 2-D array."""
    interior_cuts = sorted(capture_starts)[1:]
    segments = np.array_split(x, interior_cuts)
    return np.vstack(segments).T if stack else segments


def _voltage_scale_from_cal(cal: dict, require: bool, z0: float):
    """multiplicative raw-sample -> volts factor from the calibrated
    front-end gain (1/sqrt(2*G/z0)), or None when uncalibrated."""
    gain_dB = cal.get('gain (dB)', None)
    if gain_dB is None:
        if require:
            raise LookupError('no calibration data is available in NTIA extensions')
        return None
    return 1.0 / np.sqrt(2.0 * 10.0 ** (gain_dB / 10.0) / z0)


def read_sigmf(
    metadata_path: str, force_sample_rate: float = None, sigmf_data_ext='.npy',
    stack=False, ntia_extensions=False, z0=50,
):
    """load a SigMF capture stored in npy format, split by capture start,
    with optional gain de-embedding to volts.

    Behavior parity with reference io.py:58-96 (return contract:
    ``(captures, center_frequencies, Ts, calibration)``), decomposed here
    into payload-load / capture-split / calibration-scale steps.
    """
    metadata_path = Path(metadata_path)
    center_freqs, _timestamps, sample_rate, cal = read_sigmf_metadata(
        metadata_path, ntia=ntia_extensions
    )
    Ts = 1.0 / (force_sample_rate if force_sample_rate is not None else sample_rate)

    payload = _load_sigmf_payload(metadata_path, sigmf_data_ext)
    # segments follow sorted capture starts; sort the start -> frequency
    # pairs together so out-of-order capture metadata cannot misassign a
    # frequency to another segment (the reference splits in file order,
    # which np.array_split corrupts for unsorted starts)
    starts = sorted(center_freqs)
    freqs = np.array([center_freqs[s] for s in starts])
    captures = _cut_at_capture_starts(payload, starts, stack)

    scale = _voltage_scale_from_cal(cal, require=ntia_extensions, z0=z0)
    if scale is not None:
        captures = np.multiply(captures, scale)

    return captures, freqs, Ts, cal


def read_sigmf_to_df(
    metadata_path: str, force_sample_rate: float = None, sigmf_data_ext='.npy'
):
    """(reference io.py:99-106; stacking enabled so the captures become
    DataFrame columns — the reference passes the unstacked capture list to
    waveform_to_frame, which cannot build the frame)"""
    x_split, center_freqs, Ts, cal = read_sigmf(
        metadata_path,
        force_sample_rate=force_sample_rate,
        sigmf_data_ext=sigmf_data_ext,
        stack=True,
    )

    # the reference labels the GHz-scaled columns 'Frequency (Hz)'
    # (io.py:104-106) — a units mislabel we do not reproduce (see
    # docs/PARITY.md)
    return waveform_to_frame(
        x_split, Ts, columns=pd.Index(center_freqs / 1e9),
        column_name='Frequency (GHz)',
    )


def waveform_to_frame(
    waveform,
    Ts: float,
    columns=None,
    column_name=None,
):
    """pack IQ data into a pandas Series or DataFrame with a time index
    (reference io.py:109-147)."""
    waveform = np.asarray(waveform)
    if waveform.ndim not in (1, 2):
        raise TypeError('iq must have 1 or 2 dimensions')

    n = waveform.shape[0]
    index = pd.Index(
        np.linspace(0.0, n * Ts, n, endpoint=False), name='Time elapsed (s)'
    )

    if waveform.ndim == 1:
        return pd.Series(waveform, index=index)

    if columns is None:
        columns = np.arange(waveform.shape[1])
    frame = pd.DataFrame(waveform, index=index, columns=columns)
    if column_name is not None:
        frame.columns.name = column_name
    return frame


def resample_iq(iq, Ts, scale, axis=0):
    """(reference io.py:150-152)"""
    N = int(np.round(iq.shape[0] * scale))
    return signal.resample(iq, num=N, axis=axis), Ts / scale


def write_sigmf(
    path_stem,
    iq,
    sample_rate: float,
    *,
    center_frequency=0.0,
    datatype: str = 'cf32_le',
    timestamps=None,
    scale: float = None,
    annotations=(),
    global_fields: dict = None,
):
    """persist captured IQ + metadata as a SigMF recording.

    The write counterpart of read_sigmf/read_iq_data (the reference io.py
    is read-only; a monitor that cannot persist captures is incomplete as
    a production tool — ROADMAP item). Roundtrips through this module's
    readers.

    Args:
        path_stem: output path; '.sigmf-meta'/'.sigmf-data' suffixes are
            added (or replaced)
        iq: one 1-D complex waveform, or a list of per-capture waveforms
        sample_rate: samples/s, stored as core:sample_rate
        center_frequency: scalar, or one value per capture
        datatype: payload encoding — 'cf32_le' (complex64), 'ci16_le'
            (scaled int16), or 'npy' (numpy format, read_sigmf compatible)
        timestamps: ISO-8601 string(s) per capture (default: now, UTC)
        scale: full-scale amplitude for ci16_le quantization
            (default 32768, matching read_iq_data's 1/32768)
        annotations: SigMF annotation dicts, stored verbatim
        global_fields: extra keys merged into the global object

    Returns:
        (data_path, meta_path) as Paths
    """
    import datetime as _dt

    stem = Path(path_stem)
    while stem.suffix in ('.sigmf-meta', '.sigmf-data', '.npy'):
        stem = stem.with_suffix('')

    caps = list(iq) if isinstance(iq, (list, tuple)) else [iq]
    caps = [np.ascontiguousarray(np.asarray(c).reshape(-1)) for c in caps]
    freqs = np.broadcast_to(np.asarray(center_frequency, float), (len(caps),))
    if timestamps is None:
        now = _dt.datetime.now(_dt.timezone.utc).isoformat()
        timestamps = [now] * len(caps)
    elif isinstance(timestamps, str):
        timestamps = [timestamps] * len(caps)

    starts = np.concatenate([[0], np.cumsum([c.shape[0] for c in caps])[:-1]])
    data = np.concatenate(caps) if len(caps) > 1 else caps[0]

    meta = {
        'global': {
            'core:datatype': datatype,
            'core:sample_rate': float(sample_rate),
            'core:version': '1.0.0',
            **(global_fields or {}),
        },
        'captures': [
            {
                'core:sample_start': int(s),
                'core:frequency': float(f),
                'core:datetime': t,
            }
            for s, f, t in zip(starts, freqs, timestamps)
        ],
        'annotations': list(annotations),
    }

    # append (never with_suffix-replace) so stems containing dots keep
    # their full name and the data/meta pair stays consistent
    if datatype == 'cf32_le':
        data_path = Path(str(stem) + '.sigmf-data')
        data.astype('<c8').tofile(data_path)
    elif datatype == 'ci16_le':
        data_path = Path(str(stem) + '.sigmf-data')
        full_scale = 32768.0 if scale is None else float(scale)
        planes = np.stack([data.real, data.imag], axis=-1) * full_scale
        quantized = np.clip(np.round(planes), -32768, 32767).astype('<i2')
        quantized.tofile(data_path)
    elif datatype == 'npy':
        data_path = Path(str(stem) + '.sigmf-data.npy')
        np.save(data_path, data.astype('complex64'))
    else:
        raise ValueError(
            f"datatype must be 'cf32_le', 'ci16_le', or 'npy', not {datatype!r}"
        )

    meta_path = Path(str(stem) + '.sigmf-meta')
    meta_path.write_text(json.dumps(meta, indent=1))
    return data_path, meta_path


def read_iq_data(
    path,
    sample_format: str = 'ci16_le',
    offset_samples: int = 0,
    num_samples: int = -1,
    scale: float = None,
    threads: int = 8,
) -> np.ndarray:
    """load a raw interleaved-IQ SigMF payload as complex64.

    Native fast path (mmap + threaded int16->float32 conversion, GIL
    released) when the _iqio extension is built; numpy fallback otherwise.
    Extends the reference's .npy-only loader (io.py:77-82) to the raw
    ci16_le/cf32_le SigMF datatypes.

    Args:
        path: .sigmf-data file path
        sample_format: 'ci16_le' or 'cf32_le'
        offset_samples / num_samples: complex-sample span (-1 = to EOF)
        scale: per-sample scale (ci16 default 1/32768, cf32 default 1)
    """
    path = str(path)
    fmt = sample_format.replace('_le', '')

    if fmt == 'ci16':
        if scale is None:
            scale = 1.0 / 32768.0
        if _iqio is not None:
            return _iqio.load_ci16(
                path,
                offset_samples=offset_samples,
                num_samples=num_samples,
                scale=scale,
                threads=threads,
            )
        total = os.stat(path).st_size // 4
        n = total - offset_samples if num_samples < 0 else num_samples
        if offset_samples < 0 or n < 0 or offset_samples + n > total:
            # same contract as the native loader: out-of-range requests
            # fail loudly instead of silently truncating
            raise ValueError(
                f'requested {num_samples} samples at offset '
                f'{offset_samples} exceeds the {total}-sample file'
            )
        if n == 0:
            return np.zeros(0, dtype='complex64')
        raw = np.memmap(path, dtype=np.int16, mode='r')
        view = raw[2 * offset_samples : 2 * (offset_samples + n)]
        z = view.astype('float32').reshape(-1, 2) * np.float32(scale)
        return (z[:, 0] + 1j * z[:, 1]).astype('complex64')

    if fmt == 'cf32':
        if _iqio is not None:
            z = _iqio.load_cf32(
                path, offset_samples=offset_samples, num_samples=num_samples
            )
        else:
            total = os.stat(path).st_size // 8
            n = total - offset_samples if num_samples < 0 else num_samples
            if offset_samples < 0 or n < 0 or offset_samples + n > total:
                raise ValueError(
                    f'requested {num_samples} samples at offset '
                    f'{offset_samples} exceeds the {total}-sample file'
                )
            if n == 0:
                z = np.zeros(0, dtype='complex64')
            else:
                raw = np.memmap(path, dtype=np.complex64, mode='r')
                z = np.array(raw[offset_samples : offset_samples + n])
        if scale is not None and scale != 1.0:
            z *= np.complex64(scale)
        return z

    raise ValueError(f'unsupported sample_format {sample_format!r}')


def read_iq_planes(
    path,
    sample_format: str = 'ci16_le',
    offset_samples: int = 0,
    num_samples: int = -1,
    scale: float = None,
    threads: int = 8,
    out: np.ndarray = None,
) -> np.ndarray:
    """load a raw interleaved-IQ payload as (2, n) float32 planes.

    Row 0 is the real plane, row 1 the imag plane — the exact layout the
    TPU host->device transfer ships (the axon tunnel rejects complex64
    H2D), so the streaming pipelines skip both the interleaved-complex
    intermediate and the separate pack copy. Native single-pass
    deinterleave when the _iqio extension is built (GIL released);
    numpy fallback otherwise.

    Args:
        out: optional preallocated C-contiguous (2, n) float32 buffer
            (native path only semantics: filled and returned; the numpy
            fallback also honors it by copying in)
    """
    path = str(path)
    fmt = sample_format.replace('_le', '')
    if fmt == 'ci16' and scale is None:
        scale = 1.0 / 32768.0

    if _iqio is not None and fmt in ('ci16', 'cf32'):
        kws = {} if out is None else {'out': out}
        return _iqio.load_planes(
            path,
            fmt,
            offset_samples=offset_samples,
            num_samples=num_samples,
            scale=1.0 if scale is None else scale,
            threads=threads,
            **kws,
        )

    z = read_iq_data(
        path,
        sample_format=sample_format,
        offset_samples=offset_samples,
        num_samples=num_samples,
        scale=scale,
    )
    planes = np.stack([z.real, z.imag]).astype('float32', copy=False)
    if out is not None:
        out[...] = planes
        return out
    return planes


class CapturePrefetcher:
    """background-thread chunk feeder for long-capture streaming.

    Loads (and deinterleaves) chunk k+1 from disk while chunk k computes
    on the device: the native loader releases the GIL during mmap read +
    conversion, so a single Python thread gives true IO/compute overlap.
    In plane mode the chunks are (2, chunk_samples) float32 buffers from
    a fixed rotation (depth + 3 buffers total — memory use is bounded
    regardless of capture length). A yielded buffer is guaranteed intact
    only until ONE further chunk has been consumed; ship it to the device
    (``jnp.asarray`` copies the host buffer before returning) or
    ``np.array``-copy it before advancing further.

    Usage:

        with CapturePrefetcher(path, 2**24, 'ci16_le') as chunks:
            for planes in chunks:           # (2, 2**24) float32
                carry = step(carry, jnp.asarray(planes))

    The aux-subsystem analogue of a training input pipeline's prefetching
    host loader; the reference has no streaming reader (its io.py loads
    whole captures, io.py:58-96).
    """

    def __init__(
        self,
        path,
        chunk_samples: int,
        sample_format: str = 'ci16_le',
        *,
        scale: float = None,
        planes: bool = True,
        depth: int = 2,
        drop_last: bool = True,
        threads: int = 4,
    ):
        import os

        self.path = str(path)
        self.chunk_samples = int(chunk_samples)
        self.sample_format = sample_format
        self.scale = scale
        self.planes = planes
        self.depth = max(1, int(depth))
        self.drop_last = drop_last
        self.threads = threads

        fmt = sample_format.replace('_le', '')
        itemsize = {'ci16': 4, 'cf32': 8}[fmt]
        total = os.stat(self.path).st_size // itemsize
        self.n_chunks = total // self.chunk_samples
        self._tail = total - self.n_chunks * self.chunk_samples
        self._thread = None
        self._finished = False
        self._queue = None

    def __len__(self):
        return self.n_chunks + (1 if self._tail and not self.drop_last else 0)

    def _load(self, offset, n, out=None):
        if self.planes:
            return read_iq_planes(
                self.path,
                sample_format=self.sample_format,
                offset_samples=offset,
                num_samples=n,
                scale=self.scale,
                threads=self.threads,
                out=out,
            )
        return read_iq_data(
            self.path,
            sample_format=self.sample_format,
            offset_samples=offset,
            num_samples=n,
            scale=self.scale,
            threads=self.threads,
        )

    def _put(self, item) -> bool:
        """queue.put that gives up promptly when the consumer has left."""
        import queue

        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.05)
                return True
            except queue.Full:
                continue
        return False

    def _producer(self):
        try:
            # depth+3 buffers: the producer runs at most depth+2 chunks
            # past the oldest buffer a conforming consumer may still hold
            # (current + one previous), so rotation never overwrites it
            buffers = [
                np.empty((2, self.chunk_samples), np.float32)
                for _ in range(self.depth + 3)
            ] if self.planes else None
            for k in range(self.n_chunks):
                if self._stop.is_set():
                    return
                out = buffers[k % len(buffers)] if buffers is not None else None
                chunk = self._load(k * self.chunk_samples, self.chunk_samples, out)
                if not self._put(('chunk', chunk)):
                    return
            if self._tail and not self.drop_last and not self._stop.is_set():
                chunk = self._load(
                    self.n_chunks * self.chunk_samples, self._tail
                )
                if not self._put(('chunk', chunk)):
                    return
            self._put(('done', None))
        except BaseException as exc:  # re-raised on the consumer side
            self._put(('error', exc))

    def __enter__(self):
        import queue
        import threading

        self._queue = queue.Queue(maxsize=self.depth)
        self._stop = threading.Event()
        self._finished = False
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc_info):
        # signal the producer to abandon any remaining chunks, then join
        if self._queue is not None:
            self._stop.set()
            while self._thread.is_alive():
                try:
                    self._queue.get_nowait()
                except Exception:
                    import time

                    time.sleep(0.002)
            self._thread.join()
        # iteration after the context exits must hit the RuntimeError
        # guard rather than block on a drained queue with a dead producer
        self._queue = None
        return False

    def __iter__(self):
        if self._queue is None:
            raise RuntimeError(
                'iterate inside the context: with CapturePrefetcher(...) as c'
            )
        if self._finished:
            # the producer already delivered its end sentinel: behave
            # like any exhausted iterator instead of blocking forever on
            # a drained queue with a dead producer
            return
        while True:
            kind, payload = self._queue.get()
            if kind == 'chunk':
                yield payload
            elif kind == 'error':
                self._finished = True
                raise payload
            else:
                self._finished = True
                return


def iter_capture_chunks(
    path,
    chunk_samples: int,
    sample_format: str = 'ci16_le',
    scale: float = None,
    drop_last: bool = True,
    *,
    planes: bool = False,
):
    """iterate chunk_samples-sized chunks of a raw capture (complex64, or
    (2, n) float32 planes with ``planes=True``).

    Synchronous feeder for parallel.streaming; use
    :class:`CapturePrefetcher` to overlap the next chunk's disk read +
    conversion with device compute.
    """
    path = str(path)
    fmt = sample_format.replace('_le', '')
    itemsize = {'ci16': 4, 'cf32': 8}[fmt]

    import os

    total = os.stat(path).st_size // itemsize
    n_chunks = total // chunk_samples
    load = read_iq_planes if planes else read_iq_data

    for k in range(n_chunks):
        yield load(
            path,
            sample_format=sample_format,
            offset_samples=k * chunk_samples,
            num_samples=chunk_samples,
            scale=scale,
        )

    tail = total - n_chunks * chunk_samples
    if tail and not drop_last:
        yield load(
            path,
            sample_format=sample_format,
            offset_samples=n_chunks * chunk_samples,
            num_samples=tail,
            scale=scale,
        )
