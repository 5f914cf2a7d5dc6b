"""Core runtime tests: framing, numerics, domain context.

Oracle: numpy/scipy semantics matching reference util.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from iqwaveform_tpu import util


def test_to_blocks_basic():
    x = np.arange(12)
    b = util.to_blocks(x, 4)
    assert b.shape == (3, 4)
    np.testing.assert_array_equal(b[1], [4, 5, 6, 7])


def test_to_blocks_axis_and_truncate():
    x = np.arange(2 * 10).reshape(2, 10)
    b = util.to_blocks(x, 3, axis=1, truncate=True)
    assert b.shape == (2, 3, 3)
    with pytest.raises(ValueError):
        util.to_blocks(x, 3, axis=1, truncate=False)
    with pytest.raises(TypeError):
        util.to_blocks(x, 3.0, axis=1)


def test_to_blocks_jax_matches_numpy():
    x = np.arange(24, dtype='float32')
    a = util.to_blocks(x, 6)
    b = util.to_blocks(jnp.asarray(x), 6)
    np.testing.assert_allclose(np.asarray(b), a)


def test_axis_slice_and_index():
    x = np.arange(24).reshape(2, 3, 4)
    np.testing.assert_array_equal(util.axis_slice(x, 1, 3, axis=2), x[:, :, 1:3])
    np.testing.assert_array_equal(util.axis_slice(x, 0, None, 2, axis=1), x[:, ::2])
    np.testing.assert_array_equal(util.axis_index(x, 1, axis=1), x[:, 1])


def test_pad_along_axis():
    x = np.ones((2, 3))
    y = util.pad_along_axis(x, [[1, 2]], axis=1)
    assert y.shape == (2, 6)
    yj = util.pad_along_axis(jnp.asarray(x), [[1, 2]], axis=1)
    np.testing.assert_allclose(np.asarray(yj), y)


def test_pad_along_axis_pads_only_that_axis():
    # reference bug not reproduced (util.py:217-224): with axis=0 on a
    # multi-dim array the reference's single pad pair broadcasts to
    # EVERY axis; its negative-axis arithmetic is also off by one
    x = np.ones((2, 3))
    assert util.pad_along_axis(x, [[1, 2]], axis=0).shape == (5, 3)
    assert util.pad_along_axis(x, [[1, 2]], axis=-1).shape == (2, 6)
    assert util.pad_along_axis(x, [[1, 2]], axis=-2).shape == (5, 3)
    with pytest.raises(ValueError):
        util.pad_along_axis(x, [[1, 2]], axis=2)
    with pytest.raises(ValueError):
        util.pad_along_axis(x, [[1, 2], [3, 4]], axis=1)


def test_sliding_window_view_matches_numpy():
    x = np.arange(10, dtype='float32')
    a = util.sliding_window_view(x, 3, axis=0)
    b = util.sliding_window_view(jnp.asarray(x), 3, axis=0)
    assert a.shape == (8, 3)
    np.testing.assert_allclose(np.asarray(b), a)

    x2 = np.arange(24, dtype='float32').reshape(4, 6)
    a2 = util.sliding_window_view(x2, 3, axis=1)
    b2 = util.sliding_window_view(jnp.asarray(x2), 3, axis=1)
    np.testing.assert_allclose(np.asarray(b2), a2)


def test_isroundmod():
    assert util.isroundmod(10.0, 5)
    assert not util.isroundmod(10.1, 5)
    assert util.isroundmod(0.30000000001, 0.1, atol=1e-6)
    arr = np.array([1.0, 1.5, 2.0])
    np.testing.assert_array_equal(util.isroundmod(arr, 0.5), [True, True, True])


def test_float_dtype_like():
    assert util.float_dtype_like(np.zeros(3, 'complex64')) == np.float32
    assert util.float_dtype_like(np.zeros(3, 'complex128')) == np.float64
    assert util.float_dtype_like(np.zeros(3, 'float16')) == np.float16
    assert util.float_dtype_like(np.zeros(3, 'int32')) == np.float32
    assert util.float_dtype_like(jnp.zeros(3, 'complex64')) == np.float32
    assert (
        util.float_dtype_like(np.zeros(3, 'float16'), min_dtype='float32')
        == np.float32
    )


def test_dtype_change_float():
    assert util.dtype_change_float(np.complex128, np.float32) == np.complex64
    assert util.dtype_change_float(np.float64, np.float32) == np.float32
    assert util.dtype_change_float(np.complex64, np.float64) == np.complex128
    with pytest.raises(ValueError):
        util.dtype_change_float(np.int32, np.float32)


def test_domain_context():
    assert util.get_input_domain() == util.Domain.TIME
    with util.set_input_domain('frequency'):
        assert util.get_input_domain() == util.Domain.FREQUENCY
        with util.set_input_domain('time_binned_power'):
            assert util.get_input_domain() == util.Domain.TIME_BINNED_POWER
        assert util.get_input_domain() == util.Domain.FREQUENCY
    assert util.get_input_domain() == util.Domain.TIME


def test_array_stream():
    x = jnp.zeros(4)
    with util.array_stream(x) as s:
        s.synchronize()


def test_histogram_last_axis_matches_numpy_histogram():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 1000)).astype('float32')
    counts, edges = util.histogram_last_axis(x, 32, (-3, 3))
    assert counts.shape == (5, 32)
    for i in range(5):
        expected, _ = np.histogram(x[i], bins=32, range=(-3, 3))
        # the reference's searchsorted 'right' convention differs from
        # np.histogram only in which edge is inclusive; compare totals and
        # near-equality per bin
        assert abs(counts[i].sum() - expected.sum()) <= 2
        assert np.abs(counts[i] - expected).max() <= 1


def test_histogram_last_axis_jax_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 500)).astype('float32')
    edges = np.linspace(-3, 3, 33)
    c_np, _ = util.histogram_last_axis(x, edges)
    c_j, _ = util.histogram_last_axis(jnp.asarray(x), jnp.asarray(edges))
    np.testing.assert_array_equal(np.asarray(c_j), c_np)


def test_binned_mean():
    x = np.arange(12, dtype='float32')
    out = util.binned_mean(x, 3, fft=False)
    np.testing.assert_allclose(out, [1, 4, 7, 10])
    outj = util.binned_mean(jnp.asarray(x), 3, fft=False)
    np.testing.assert_allclose(np.asarray(outj), out)


def test_binned_mean_fft_centered_clamp():
    # size=26, count=3: the naive symmetric span is [0, 27) which
    # overruns the axis (ADVICE r3); the clamp shrinks by a block pair
    # to [3, 24) keeping index 13 centered in a middle bin
    from iqwaveform_tpu.utils.framing import _whole_bin_span

    start, stop = _whole_bin_span(26, 3, centered=True)
    assert (start, stop) == (3, 24)
    mid_rel = 13 - start
    assert mid_rel % 3 == 1  # mid index is the center of its bin

    x = np.arange(26, dtype='float32')
    out = util.binned_mean(x, 3, fft=True)
    np.testing.assert_allclose(out, np.arange(4.0, 24.0, 3.0))

    # spans that already fit are untouched (center bin [5, 8) holds
    # the mid index 6)
    assert _whole_bin_span(12, 3, centered=True) == (2, 11)


def test_ceildiv():
    assert util.ceildiv(7, 2) == 4
    assert util.ceildiv(8, 2) == 4


def test_find_float_inds():
    assert util.find_float_inds(('0.5', 'mean', 0.9, 'max')) == [
        True,
        False,
        True,
        False,
    ]


def test_grouped_views_along_axis():
    x = np.zeros((8, 100))
    views = list(util.grouped_views_along_axis(x, 200, axis=1))
    total = sum(v.size for v in views)
    assert total == x.size


def test_iter_along_axes_out_of_range_axis_ignored():
    """out-of-range axes match no dimension (reference util.py:571-589
    semantics): every dimension then gets the whole slice."""
    from iqwaveform_tpu.utils.framing import iter_along_axes

    x = np.zeros((3, 4))
    assert list(iter_along_axes(x, (2,))) == [(slice(None), slice(None))]
    # negative in-range axes normalize; -1 enumerates the last dimension
    assert len(list(iter_along_axes(x, (-1,)))) == 4


def test_counter_fold_exact_beyond_float32():
    """(hi, lo) pair counters accumulate exactly past 2**24, where plain
    float32 addition starts dropping small increments."""
    from iqwaveform_tpu.utils.numerics import counter_fold, counter_value

    hi = np.zeros(3, np.float32)
    lo = np.zeros(3, np.float32)
    plain = np.zeros(3, np.float32)

    # drive one lane far past 2**24 with large deltas, then add small ones
    big = np.array([2**22, 0, 17], np.float32)
    for _ in range(8):  # lane 0 reaches 2**25
        hi, lo = counter_fold(hi, lo, big)
        plain += big
    small = np.array([3, 1, 5], np.float32)
    for _ in range(10):
        hi, lo = counter_fold(hi, lo, small)
        plain += small

    exact = 8 * big.astype(np.int64) + 10 * small.astype(np.int64)
    # the (hi, lo) pair itself is exact; read it out in int64
    got = hi.astype(np.int64) * 2**23 + lo.astype(np.int64)
    np.testing.assert_array_equal(got, exact)
    # the float32 readout is nearest-f32 of the exact value
    np.testing.assert_array_equal(
        counter_value(hi, lo), exact.astype(np.float32)
    )
    # the plain float32 accumulator demonstrably lost the +3 increments
    assert plain[0] != exact[0]
    # components stay integer-valued float32 in range
    assert (lo < 2**23).all() and (lo >= 0).all()


def test_reference_facade_import_surface():
    """every helper the reference modules leak into their public
    namespaces stays importable from the same place here (audited
    against an actual import of /root/reference with stubbed cupy
    deps; `from iqwaveform.fourier import axis_slice`-style user code
    must keep working after the package rename)."""
    import importlib

    surface = {
        'util': [
            'Domain', 'set_input_domain', 'get_input_domain',
            'NonStreamContext', 'array_stream', 'pad_along_axis',
            'array_namespace', 'sliding_window_view', 'float_dtype_like',
            'to_blocks', 'axis_slice', 'axis_index', 'lru_cache',
            'isroundmod', 'histogram_last_axis', 'lazy_import',
            'is_cupy_array', 'find_float_inds', 'dtype_change_float',
        ],
        'fourier': [
            'stft', 'istft', 'spectrogram', 'ola_filter', 'oaresample',
            'resample', 'upfirdn', 'oaconvolve', 'get_window',
            'design_cola_resampler', 'channelize_power', 'fftfreq',
            'cpu_count', 'MAX_CUPY_FFT_SAMPLES', 'ArrayType', 'Domain',
            'array_namespace', 'axis_index', 'axis_slice',
            'dtype_change_float', 'find_float_inds', 'get_input_domain',
            'is_cupy_array', 'isroundmod', 'lazy_import', 'lru_cache',
            'pad_along_axis', 'register_extra_windows',
            'sliding_window_view', 'stat_ufunc_from_shorthand',
        ],
        'power_analysis': [
            'powtodB', 'dBtopow', 'envtopow', 'envtodB', 'sample_ccdf',
            'iq_to_bin_power', 'iq_to_cyclic_power', 'ArrayLike',
            'ArrayType', 'Domain', 'array_namespace', 'float_dtype_like',
            'get_input_domain', 'histogram_last_axis', 'is_cupy_array',
            'isroundmod', 'lazy_import', 'lru_cache', 'to_blocks',
        ],
        'ofdm': [
            'PhyOFDM', 'Phy3GPP', 'Phy802_16', 'corr_at_indices',
            'pss_5g_nr', 'sss_5g_nr', 'ArrayType', 'array_namespace',
            'isroundmod', 'lru_cache', 'pad_along_axis',
        ],
        'windows': ['acg', 'cosh', 'knab', 'modified_bessel',
                    'register_extra_windows', 'lazy_import'],
        'type_stubs': ['ArrayType', 'ArrayLike', 'SeriesType',
                       'DataFrameType', 'IndexType', 'AxisType',
                       'LocatorType', 'DataArrayType', 'DatasetType',
                       'TypeAlias'],
        'figures': [
            'GammaLogitFormatter', 'GammaMaxNLocator', 'GammaQQScale',
            'contiguous_segments', 'is_decade', 'pcolormesh_df',
            'plot_power_ccdf', 'plot_power_histogram_heatmap',
            'plot_spectrogram_heatmap', 'plot_spectrogram_heatmap_from_iq',
            'rotate_ticklabels_on_collision', 'round_places',
            'xaxis_concise_dates',
        ],
        'io': [
            'extract_ntia_calibration_metadata', 'read_sigmf',
            'read_sigmf_metadata', 'read_sigmf_to_df', 'resample_iq',
            'waveform_to_frame',
        ],
    }
    for mod, names in surface.items():
        m = importlib.import_module(f'iqwaveform_tpu.{mod}')
        missing = [n for n in names if not hasattr(m, n)]
        assert not missing, f'{mod} missing {missing}'
