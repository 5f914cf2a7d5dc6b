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
