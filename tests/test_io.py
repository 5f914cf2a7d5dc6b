"""SigMF I/O and pandas framing tests (reference io.py)."""

import json

import numpy as np
import pandas as pd
import pytest

from iqwaveform_tpu import io


@pytest.fixture
def sigmf_capture(tmp_path):
    meta = {
        'global': {'core:sample_rate': 15.36e6, 'core:datatype': 'cf32'},
        'captures': [
            {
                'core:sample_start': 0,
                'core:frequency': 3.7e9,
                'core:datetime': '2024-01-01T00:00:00Z',
            },
            {
                'core:sample_start': 1000,
                'core:frequency': 3.8e9,
                'core:datetime': '2024-01-01T00:00:01Z',
            },
        ],
        'annotations': [
            {
                'ntia-core:annotation_type': 'CalibrationAnnotation',
                'ntia-sensor:temperature': 25.0,
                'ntia-sensor:noise_figure_sensor': 5.0,
                'ntia-sensor:gain_preselector': 30.0,
            }
        ],
    }
    meta_path = tmp_path / 'capture.sigmf-meta'
    meta_path.write_text(json.dumps(meta))

    rng = np.random.default_rng(0)
    data = (rng.standard_normal(2000) + 1j * rng.standard_normal(2000)).astype(
        'complex64'
    )
    np.save(meta_path.with_suffix('.sigmf-data.npy'), data)
    return meta_path, data


def test_read_sigmf_metadata(sigmf_capture):
    meta_path, _ = sigmf_capture
    freqs, stamps, fs, cal = io.read_sigmf_metadata(meta_path)
    assert fs == 15.36e6
    assert freqs == {0: 3.7e9, 1000: 3.8e9}
    assert cal == {}


def test_read_sigmf_metadata_ntia(sigmf_capture):
    meta_path, _ = sigmf_capture
    _, _, _, cal = io.read_sigmf_metadata(meta_path, ntia=True)
    assert cal['ambient temperature (K)'] == 25.0 + 273.15
    assert cal['noise figure (dB)'] == 5.0
    assert cal['gain (dB)'] == 30.0


def test_read_sigmf(sigmf_capture):
    meta_path, data = sigmf_capture
    x_split, center_freqs, Ts, cal = io.read_sigmf(meta_path)
    assert len(x_split) == 2
    assert x_split[0].shape == (1000,)
    np.testing.assert_allclose(x_split[0], data[:1000])
    np.testing.assert_allclose(center_freqs, [3.7e9, 3.8e9])
    assert Ts == 1 / 15.36e6


def test_read_sigmf_gain_deembed(sigmf_capture):
    meta_path, data = sigmf_capture
    x_split, _, _, cal = io.read_sigmf(meta_path, ntia_extensions=True)
    gain = 10 ** (30.0 / 10)
    expected = data[:1000] / np.sqrt(gain * 2 / 50)
    np.testing.assert_allclose(x_split[0], expected, rtol=1e-6)


def test_waveform_to_frame_series():
    x = np.arange(10, dtype='complex64')
    s = io.waveform_to_frame(x, 1e-6)
    assert isinstance(s, pd.Series)
    assert s.index.name == 'Time elapsed (s)'
    np.testing.assert_allclose(s.index[-1], 9e-6)


def test_waveform_to_frame_dataframe():
    x = np.zeros((10, 3), dtype='complex64')
    df = io.waveform_to_frame(x, 1e-6, columns=[1.0, 2.0, 3.0], column_name='Freq')
    assert isinstance(df, pd.DataFrame)
    assert df.columns.name == 'Freq'
    assert df.shape == (10, 3)
    with pytest.raises(TypeError):
        io.waveform_to_frame(np.zeros((2, 2, 2)), 1e-6)


def test_resample_iq():
    x = np.zeros(100, dtype='complex64')
    y, Ts = io.resample_iq(x, 1e-6, 0.5)
    assert y.shape == (50,)
    assert Ts == 2e-6


def test_read_iq_data_ci16(tmp_path):
    rng = np.random.default_rng(0)
    iq16 = rng.integers(-32768, 32767, size=4000, dtype='int16')
    path = tmp_path / 'raw.sigmf-data'
    iq16.tofile(path)

    x = io.read_iq_data(path, 'ci16_le')
    z = iq16.reshape(-1, 2).astype('float32') / 32768
    expected = (z[:, 0] + 1j * z[:, 1]).astype('complex64')
    assert x.dtype == np.complex64
    np.testing.assert_allclose(x, expected)

    x2 = io.read_iq_data(path, 'ci16_le', offset_samples=100, num_samples=50)
    np.testing.assert_allclose(x2, expected[100:150])


def test_read_iq_data_cf32(tmp_path):
    rng = np.random.default_rng(1)
    iq = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)).astype(
        'complex64'
    )
    path = tmp_path / 'raw32.sigmf-data'
    iq.tofile(path)
    x = io.read_iq_data(path, 'cf32_le')
    np.testing.assert_allclose(x, iq)


def test_read_iq_data_fallback_matches_native(tmp_path):
    """numpy fallback and native loader must agree exactly."""
    pytest.importorskip('iqwaveform_tpu._iqio')
    rng = np.random.default_rng(2)
    iq16 = rng.integers(-32768, 32767, size=2000, dtype='int16')
    path = tmp_path / 'x.sigmf-data'
    iq16.tofile(path)

    native = io.read_iq_data(path, 'ci16_le')

    saved = io._iqio
    try:
        io._iqio = None
        fallback = io.read_iq_data(path, 'ci16_le')
    finally:
        io._iqio = saved

    np.testing.assert_array_equal(native, fallback)


def test_iter_capture_chunks(tmp_path):
    rng = np.random.default_rng(3)
    iq = (rng.standard_normal(1050) + 1j * rng.standard_normal(1050)).astype(
        'complex64'
    )
    path = tmp_path / 'chunks.sigmf-data'
    iq.tofile(path)

    chunks = list(io.iter_capture_chunks(path, 256, sample_format='cf32_le'))
    assert len(chunks) == 4
    np.testing.assert_allclose(np.concatenate(chunks), iq[: 4 * 256])

    chunks = list(
        io.iter_capture_chunks(path, 256, sample_format='cf32_le', drop_last=False)
    )
    assert sum(c.shape[0] for c in chunks) == 1050


def test_read_sigmf_to_df(sigmf_capture):
    meta_path, data = sigmf_capture
    df = io.read_sigmf_to_df(meta_path)
    # two captures of 1000 samples stacked as columns? reference stacks
    # only when stack=True; read_sigmf_to_df passes the split list through
    assert df is not None


def test_read_sigmf_to_df_columns(sigmf_capture):
    meta_path, data = sigmf_capture
    df = io.read_sigmf_to_df(meta_path)
    assert df.shape == (1000, 2)
    # reference mislabels the GHz-scaled columns 'Frequency (Hz)'
    # (docs/PARITY.md); we keep GHz values with an honest label
    assert df.columns.name == 'Frequency (GHz)'
    np.testing.assert_allclose(df.columns.values, [3.7, 3.8])


def test_write_sigmf_roundtrip_cf32(tmp_path):
    """write -> read roundtrip of a cf32_le recording + metadata."""
    rng = np.random.default_rng(0)
    iq = (rng.standard_normal(1234) + 1j * rng.standard_normal(1234)).astype(
        'complex64'
    )
    data_path, meta_path = io.write_sigmf(
        tmp_path / 'cap', iq, 10e6, center_frequency=3.6e9
    )
    back = io.read_iq_data(data_path, sample_format='cf32_le')
    np.testing.assert_array_equal(back, iq)

    freqs, times, fs, cal = io.read_sigmf_metadata(meta_path)
    assert fs == 10e6
    assert freqs == {0: 3.6e9}


def test_write_sigmf_roundtrip_ci16(tmp_path):
    """int16 quantization roundtrips within half an LSB."""
    rng = np.random.default_rng(1)
    iq = (rng.standard_normal(500) + 1j * rng.standard_normal(500)).astype(
        'complex64'
    )
    # keep within the int16 full scale so no sample clips
    iq = iq * (0.9 / max(np.abs(iq.real).max(), np.abs(iq.imag).max()))
    data_path, _ = io.write_sigmf(
        tmp_path / 'cap16', iq, 1e6, datatype='ci16_le'
    )
    back = io.read_iq_data(data_path, sample_format='ci16_le')
    lsb = 1.0 / 32768.0
    assert np.abs(back.real - iq.real).max() <= lsb
    assert np.abs(back.imag - iq.imag).max() <= lsb


def test_write_sigmf_npy_multicapture(tmp_path):
    """multi-capture npy recordings read back through read_sigmf with the
    per-capture split and frequencies intact."""
    rng = np.random.default_rng(2)
    caps = [
        (rng.standard_normal(400) + 1j * rng.standard_normal(400)).astype(
            'complex64'
        )
        for _ in range(3)
    ]
    _, meta_path = io.write_sigmf(
        tmp_path / 'multi',
        caps,
        30.72e6,
        center_frequency=[1e9, 2e9, 3e9],
        datatype='npy',
    )
    x_split, freqs, Ts, cal = io.read_sigmf(meta_path)
    assert len(x_split) == 3
    np.testing.assert_array_equal(freqs, [1e9, 2e9, 3e9])
    assert Ts == 1.0 / 30.72e6
    for got, exp in zip(x_split, caps):
        np.testing.assert_array_equal(got, exp)


def _write_ci16(path, x, scale=32768.0):
    q = np.clip(
        np.round(np.stack([x.real, x.imag], axis=-1) * scale), -32768, 32767
    ).astype('<i2')
    q.tofile(path)
    return q.astype('float32') / scale


def test_read_iq_planes_ci16(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)).astype(
        'complex64'
    )
    ref = _write_ci16(tmp_path / 'a.sigmf-data', x)

    p = io.read_iq_planes(tmp_path / 'a.sigmf-data', 'ci16_le')
    assert p.shape == (2, 1000) and p.dtype == np.float32
    np.testing.assert_allclose(p[0], ref[:, 0], atol=1e-7)
    np.testing.assert_allclose(p[1], ref[:, 1], atol=1e-7)

    # offset + span + out= reuse
    buf = np.empty((2, 100), np.float32)
    p2 = io.read_iq_planes(
        tmp_path / 'a.sigmf-data', 'ci16', offset_samples=10,
        num_samples=100, out=buf,
    )
    assert p2 is buf
    np.testing.assert_allclose(buf[0], ref[10:110, 0], atol=1e-7)


def test_read_iq_planes_cf32(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(500) + 1j * rng.standard_normal(500)).astype(
        'complex64'
    )
    x.tofile(tmp_path / 'b.sigmf-data')
    p = io.read_iq_planes(tmp_path / 'b.sigmf-data', 'cf32_le')
    np.testing.assert_array_equal(p[0], x.real)
    np.testing.assert_array_equal(p[1], x.imag)

    # matches the complex loader reinterpreted
    z = io.read_iq_data(tmp_path / 'b.sigmf-data', 'cf32_le')
    np.testing.assert_array_equal(p[0] + 1j * p[1], z)


def test_read_iq_cf32_scale_applied(tmp_path):
    """an explicit scale= must scale cf32 payloads in both loaders
    (ADVICE r2: the native plane path used to drop it silently)."""
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(256) + 1j * rng.standard_normal(256)).astype(
        'complex64'
    )
    x.tofile(tmp_path / 'c.sigmf-data')

    p = io.read_iq_planes(tmp_path / 'c.sigmf-data', 'cf32_le', scale=0.25)
    np.testing.assert_allclose(p[0], 0.25 * x.real, rtol=1e-6)
    np.testing.assert_allclose(p[1], 0.25 * x.imag, rtol=1e-6)

    z = io.read_iq_data(tmp_path / 'c.sigmf-data', 'cf32_le', scale=0.25)
    np.testing.assert_allclose(z, (0.25 * x).astype('complex64'), rtol=1e-6)


def test_capture_prefetcher_post_context_iteration_raises(tmp_path):
    """iterating after the with-block must raise, not block forever
    (ADVICE r2: __exit__ used to leave the drained queue in place)."""
    import pytest

    x = np.arange(4096 * 2, dtype='complex64')
    x.tofile(tmp_path / 'd.sigmf-data')
    pf = io.CapturePrefetcher(tmp_path / 'd.sigmf-data', 4096, 'cf32_le')
    with pf as chunks:
        for _ in chunks:
            pass
    with pytest.raises(RuntimeError, match='inside the context'):
        next(iter(pf))


def test_capture_prefetcher_matches_sync(tmp_path):
    rng = np.random.default_rng(2)
    n = 4096 * 5 + 17  # 5 whole chunks + a tail
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        'complex64'
    )
    _write_ci16(tmp_path / 'c.sigmf-data', x)

    sync = list(
        io.iter_capture_chunks(
            tmp_path / 'c.sigmf-data', 4096, 'ci16_le', planes=True
        )
    )
    assert len(sync) == 5

    pre = io.CapturePrefetcher(
        tmp_path / 'c.sigmf-data', 4096, 'ci16_le', depth=2
    )
    assert len(pre) == 5
    with pre as chunks:
        got = [np.array(c) for c in chunks]  # copy: buffers rotate
    assert len(got) == 5
    for a, b in zip(got, sync):
        np.testing.assert_array_equal(a, b)

    # complex (non-plane) mode, keep the tail
    pre_c = io.CapturePrefetcher(
        tmp_path / 'c.sigmf-data', 4096, 'ci16_le', planes=False,
        drop_last=False,
    )
    with pre_c as chunks:
        got_c = list(chunks)
    assert len(got_c) == 6 and got_c[-1].shape[0] == 17
    np.testing.assert_array_equal(
        got_c[0], sync[0][0] + 1j * sync[0][1]
    )


def test_capture_prefetcher_early_exit(tmp_path):
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(4096 * 8) + 0j).astype('complex64')
    _write_ci16(tmp_path / 'd.sigmf-data', x)
    with io.CapturePrefetcher(
        tmp_path / 'd.sigmf-data', 4096, 'ci16_le', depth=1
    ) as chunks:
        for i, _ in enumerate(chunks):
            if i == 1:
                break
    # context exit must not deadlock; reuse afterwards raises
    pre = io.CapturePrefetcher(tmp_path / 'd.sigmf-data', 4096, 'ci16_le')
    with pytest.raises(RuntimeError):
        next(iter(pre))


def test_read_iq_planes_fallback_matches_native(tmp_path):
    pytest.importorskip('iqwaveform_tpu._iqio')
    rng = np.random.default_rng(4)
    iq16 = rng.integers(-32768, 32767, size=2000, dtype='int16')
    path = tmp_path / 'y.sigmf-data'
    iq16.tofile(path)

    native = io.read_iq_planes(path, 'ci16_le', offset_samples=3, num_samples=900)
    saved = io._iqio
    try:
        io._iqio = None
        buf = np.empty((2, 900), np.float32)
        fallback = io.read_iq_planes(
            path, 'ci16_le', offset_samples=3, num_samples=900, out=buf
        )
    finally:
        io._iqio = saved
    assert fallback is buf
    np.testing.assert_array_equal(native, fallback)


def test_write_sigmf_dotted_stem(tmp_path):
    """a stem containing dots keeps its full name for BOTH files."""
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(64) + 1j * rng.standard_normal(64)).astype(
        'complex64'
    )
    data_path, meta_path = io.write_sigmf(
        tmp_path / 'run.r2.capture', x, 1e6, datatype='npy'
    )
    assert data_path.name == 'run.r2.capture.sigmf-data.npy'
    assert meta_path.name == 'run.r2.capture.sigmf-meta'
    x_split, _, _, _ = io.read_sigmf(meta_path)
    np.testing.assert_array_equal(x_split[0], x)


def test_capture_prefetcher_early_exit_is_prompt(tmp_path):
    """breaking out of the loop cancels the producer instead of letting
    it read the rest of the capture."""
    import time

    rng = np.random.default_rng(6)
    x = (rng.standard_normal(4096 * 64) + 0j).astype('complex64')
    _write_ci16(tmp_path / 'e.sigmf-data', x)
    pre = io.CapturePrefetcher(tmp_path / 'e.sigmf-data', 4096, 'ci16_le', depth=1)
    t0 = time.perf_counter()
    with pre as chunks:
        next(iter(chunks))
    dt = time.perf_counter() - t0
    assert dt < 2.0
    assert not pre._thread.is_alive()


def test_read_sigmf_out_of_order_captures(tmp_path):
    """capture starts listed out of order must keep each segment paired
    with its own center frequency (sorted together; the reference's
    file-order array_split corrupts this case — docs/PARITY.md)."""
    meta = {
        'global': {'core:sample_rate': 1e6, 'core:datatype': 'cf32'},
        'captures': [
            {'core:sample_start': 1200, 'core:frequency': 2.0e9,
             'core:datetime': '2024-01-01T00:00:01Z'},
            {'core:sample_start': 0, 'core:frequency': 1.0e9,
             'core:datetime': '2024-01-01T00:00:00Z'},
        ],
    }
    meta_path = tmp_path / 'ooo.sigmf-meta'
    meta_path.write_text(json.dumps(meta))
    data = np.concatenate(
        [np.full(1200, 1 + 0j), np.full(800, 2 + 0j)]
    ).astype('complex64')
    np.save(meta_path.with_suffix('.sigmf-data.npy'), data)

    captures, freqs, Ts, _cal = io.read_sigmf(meta_path)
    assert [len(c) for c in captures] == [1200, 800]
    np.testing.assert_allclose(freqs, [1.0e9, 2.0e9])
    # the segment of 1s belongs to the capture at start 0 = 1 GHz
    assert captures[0][0] == 1 + 0j and captures[1][0] == 2 + 0j


def test_read_iq_data_fallback_bounds(tmp_path):
    """the numpy fallback enforces the same bounds contract as the
    native loader instead of silently truncating."""
    rng = np.random.default_rng(0)
    iq16 = rng.integers(-1000, 1000, size=240, dtype='int16')  # 120 samples
    path = tmp_path / 'b.sigmf-data'
    iq16.tofile(path)
    (rng.standard_normal(120).astype('complex64')).tofile(
        tmp_path / 'b32.sigmf-data'
    )

    saved = io._iqio
    try:
        io._iqio = None
        with pytest.raises(ValueError, match='exceeds'):
            io.read_iq_data(path, 'ci16_le', offset_samples=100, num_samples=50)
        with pytest.raises(ValueError, match='exceeds'):
            io.read_iq_data(
                tmp_path / 'b32.sigmf-data', 'cf32_le',
                offset_samples=100, num_samples=50,
            )
        # zero-length reads (incl. empty files) return empty, not memmap
        # errors
        empty = tmp_path / 'empty.sigmf-data'
        empty.write_bytes(b'')
        assert io.read_iq_data(empty, 'ci16_le').shape == (0,)
    finally:
        io._iqio = saved


def test_capture_prefetcher_exhausted_reiteration(tmp_path):
    """a second iteration after exhaustion inside the context yields
    nothing (regression: it deadlocked on the drained queue)."""
    rng = np.random.default_rng(1)
    iq16 = rng.integers(-1000, 1000, size=4096 * 2 * 4, dtype='int16')
    path = tmp_path / 'x.sigmf-data'
    iq16.tofile(path)

    with io.CapturePrefetcher(path, 4096, 'ci16_le') as chunks:
        first = [np.array(c) for c in chunks]
        again = list(chunks)
    assert len(first) == 4
    assert again == []


def test_native_load_planes_rejects_readonly_out(tmp_path):
    """a read-only ``out`` buffer must raise, not crash the process."""
    _iqio = pytest.importorskip('iqwaveform_tpu._iqio')
    rng = np.random.default_rng(2)
    iq16 = rng.integers(-1000, 1000, size=512, dtype='int16')
    path = tmp_path / 'ro.sigmf-data'
    iq16.tofile(path)

    out = np.zeros((2, 256), dtype='float32')
    out.setflags(write=False)
    with pytest.raises(ValueError, match='writeable'):
        io.read_iq_planes(path, 'ci16_le', out=out)
