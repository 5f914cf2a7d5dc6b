"""MXU four-step FFT tests (oracle: numpy float64 FFT)."""

import jax.numpy as jnp
import numpy as np
import pytest

from iqwaveform_tpu.ops.mxu_fft import fft_mxu, ifft_mxu, plan_factors


@pytest.mark.parametrize('n', [64, 100, 1024, 2048, 4096, 16384])
def test_fft_mxu_matches_numpy(n):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))).astype(
        'complex64'
    )
    ref = np.fft.fft(x.astype('complex128'), axis=1)
    got = np.asarray(fft_mxu(jnp.asarray(x), axis=1))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_ifft_roundtrip():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((4, 2048)) + 1j * rng.standard_normal((4, 2048))).astype(
        'complex64'
    )
    back = np.asarray(ifft_mxu(fft_mxu(jnp.asarray(x), axis=1), axis=1))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_axis_argument():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((256, 4)) + 1j * rng.standard_normal((256, 4))).astype(
        'complex64'
    )
    ref = np.fft.fft(x.astype('complex128'), axis=0)
    got = np.asarray(fft_mxu(jnp.asarray(x), axis=0))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_prime_size_raises():
    # primes > 128 have no MXU-friendly factorization
    with pytest.raises(ValueError):
        plan_factors(131)


def test_prime_below_lanes_direct_dft():
    # primes <= 128 degenerate to a direct (n, n) DFT matmul (a=1)
    assert plan_factors(127) == (1, 127)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((4, 127)) + 1j * rng.standard_normal((4, 127))).astype(
        'complex64'
    )
    ref = np.fft.fft(x.astype('complex128'), axis=1)
    got = np.asarray(fft_mxu(jnp.asarray(x), axis=1))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_monitor_mxu_backend_matches_xla():
    import jax

    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor

    from conftest import make_tone_noise

    kw = dict(
        bw=0.8e6, channel_count=4, fft_size_per_channel=64,
        window='hamming', apd_bins=256, min_fft_size=255, fs_sdr=2e6,
    )
    d_xla = design_wideband_monitor(2e6, 1e6, fft_backend='xla', **kw)
    d_mxu = design_wideband_monitor(2e6, 1e6, fft_backend='mxu', **kw)

    mon_x, mon_m = WidebandMonitor(d_xla), WidebandMonitor(d_mxu)
    n = mon_x.min_input_multiple() * 4
    x = jnp.asarray(make_tone_noise(n, fs=2e6, f_tone=150e3, snr_db=30))

    out_x = jax.jit(mon_x.step)(x)
    out_m = jax.jit(mon_m.step)(x)

    np.testing.assert_allclose(
        np.asarray(out_m['psd_mean']), np.asarray(out_x['psd_mean']), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_m['channel_power_mean']),
        np.asarray(out_x['channel_power_mean']),
        rtol=1e-4,
    )
    # APD bin boundaries are sensitive to roundoff; totals must agree and
    # per-bin counts to a small miscount
    assert (
        int(np.abs(np.asarray(out_m['apd_counts']) - np.asarray(out_x['apd_counts'])).sum())
        <= n // 64
    )


def test_fused_ola_matches_separate():
    from iqwaveform_tpu.ops.mxu_fft import (
        fused_ola_mxu,
        fused_ola_supported,
        fft_mxu,
        ifft_mxu,
    )

    nfft, nfft_out = 1024, 512
    bounds_in = (256, 768)
    zero_lo, zero_hi = 300, 700
    assert fused_ola_supported(nfft, nfft_out, bounds_in, (0, nfft_out))

    rng = np.random.default_rng(0)
    frames = (
        rng.standard_normal((6, nfft)) + 1j * rng.standard_normal((6, nfft))
    ).astype('complex64')

    # naive: fft -> zero -> slice -> ifft
    Y = np.array(fft_mxu(jnp.asarray(frames), axis=1))
    Y[:, :zero_lo] = 0
    Y[:, zero_hi:] = 0
    Y = Y[:, bounds_in[0] : bounds_in[1]]
    expected = np.asarray(ifft_mxu(jnp.asarray(Y), axis=1))

    got = np.asarray(
        fused_ola_mxu(
            jnp.asarray(frames),
            nfft=nfft,
            nfft_out=nfft_out,
            zero_lo=zero_lo,
            zero_hi=zero_hi,
            bounds_in=bounds_in,
        )
    )
    np.testing.assert_allclose(got, expected, atol=2e-6)


def test_fused_ola_supported_conditions():
    from iqwaveform_tpu.ops.mxu_fft import fused_ola_supported

    assert fused_ola_supported(16384, 8192, (4096, 12288), (0, 8192))
    # narrow passband: aligned full-width window via bounds_out offset
    assert fused_ola_supported(16384, 8192, (5526, 10858), (1430, 6762))
    # misaligned effective window start
    assert not fused_ola_supported(16384, 8192, (4095, 12288), (0, 8192))
    # primes > 128 have no factorization at all
    assert not fused_ola_supported(131, 131, (0, 131), (0, 131))


def test_fused_ola_narrow_passband_matches_separate():
    """margin-filled output: fused path must equal zero-fill + ifft."""
    from iqwaveform_tpu.ops.mxu_fft import (
        fused_ola_mxu,
        fused_ola_supported,
        fft_mxu,
        ifft_mxu,
    )

    nfft, nfft_out = 1024, 512
    from iqwaveform_tpu.ops.filtering import _find_downsample_copy_range

    # passband chosen so the effective window start is a-aligned
    b_out, b_in, _ = _find_downsample_copy_range(nfft, nfft_out, 400, 688)
    zero_lo, zero_hi = 410, 680
    assert fused_ola_supported(nfft, nfft_out, b_in, b_out)

    rng = np.random.default_rng(0)
    frames = (
        rng.standard_normal((5, nfft)) + 1j * rng.standard_normal((5, nfft))
    ).astype('complex64')

    Y = np.array(fft_mxu(jnp.asarray(frames), axis=1))
    Y[:, :zero_lo] = 0
    Y[:, zero_hi:] = 0
    Yk = Y[:, b_in[0] : b_in[1]]
    Yfull = np.zeros((5, nfft_out), dtype='complex64')
    Yfull[:, b_out[0] : b_out[1]] = Yk
    expected = np.asarray(ifft_mxu(jnp.asarray(Yfull), axis=1))

    got = np.asarray(
        fused_ola_mxu(
            jnp.asarray(frames),
            nfft=nfft,
            nfft_out=nfft_out,
            zero_lo=zero_lo,
            zero_hi=zero_hi,
            bounds_in=b_in,
            bounds_out=b_out,
        )
    )
    np.testing.assert_allclose(got, expected, atol=2e-6)


def test_stft_mxu_backend_matches_xla():
    from conftest import make_tone_noise
    from iqwaveform_tpu import fourier

    x = jnp.asarray(make_tone_noise(1024 * 16))
    a = fourier.stft(
        x, fs=1e6, window='hann', nperseg=1024, noverlap=512,
        return_axis_arrays=False,
    )
    b = fourier.stft(
        x, fs=1e6, window='hann', nperseg=1024, noverlap=512,
        return_axis_arrays=False, fft_backend='mxu',
    )
    scale = float(np.abs(np.asarray(a)).max())
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6 * scale)

    # istft roundtrip through the mxu backend
    xr = fourier.istft(b, nfft=1024, noverlap=512, fft_backend='mxu')
    xr_ref = fourier.istft(a, nfft=1024, noverlap=512)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(xr_ref), atol=1e-5)


@pytest.mark.parametrize(
    'nfft,nfft_out,zero,b_in,b_out',
    [
        # misaligned edges: both boundary-column corrections live
        (1024, 512, (300, 700), (256, 768), (0, 512)),
        # flagship monitor bounds (nfft_out/a == 128: no pad-lane slack)
        (16384, 8192, (5526, 10858), (5526, 10858), (1430, 6762)),
        # all-pass: no partial columns, pure fold
        (1024, 1024, (0, None), (0, 1024), (0, 1024)),
        # single partial column: interval shorter than one column
        (1024, 512, (301, 305), (256, 768), (0, 512)),
    ],
)
def test_fused_ola_fold_matches_unfolded(nfft, nfft_out, zero, b_in, b_out):
    """the mask-folded path (trim+mask+k2-inverse in one constant
    matmul + rank-1 boundary corrections) must equal the literal
    four-matmul chain AND a float64 fft oracle."""
    from iqwaveform_tpu.ops.mxu_fft import fused_ola_mxu

    rng = np.random.default_rng(0)
    frames = (
        rng.standard_normal((4, nfft)) + 1j * rng.standard_normal((4, nfft))
    ).astype('complex64')
    kws = dict(
        nfft=nfft, nfft_out=nfft_out, zero_lo=zero[0], zero_hi=zero[1],
        bounds_in=b_in, bounds_out=b_out,
    )
    # fold='force' exercises the corrections-as-einsums path even where
    # the production dispatch (fold=True) would pick the unfolded chain
    # for speed (n_corr > 0 on the XLA path; scripts/probe_fold_xla.py)
    got = np.asarray(fused_ola_mxu(jnp.asarray(frames), fold='force', **kws))
    auto = np.asarray(fused_ola_mxu(jnp.asarray(frames), **kws))
    ref = np.asarray(fused_ola_mxu(jnp.asarray(frames), fold=False, **kws))

    Y = np.fft.fft(frames.astype('complex128'), axis=1)
    zhi = nfft if zero[1] is None else zero[1]
    keep = np.zeros(nfft)
    keep[zero[0] : zhi] = 1
    Y *= keep
    Yf = np.zeros((4, nfft_out), 'complex128')
    hi = nfft_out if b_out[1] is None else b_out[1]
    Yf[:, b_out[0] : hi] = Y[:, b_in[0] : b_in[1]]
    oracle = np.fft.ifft(Yf, axis=1)

    scale = max(np.abs(oracle).max(), 1e-12)
    assert np.abs(got - ref).max() / scale < 3e-6
    assert np.abs(got - oracle).max() / scale < 3e-6
    assert np.abs(auto - oracle).max() / scale < 3e-6


def test_fused_ola_folded_constants_exact():
    """H0 + rank-1 boundary corrections reconstruct the masked
    two-matmul chain exactly in float64 (independent of any jit path)."""
    from iqwaveform_tpu.ops.mxu_fft import (
        _fused_ola_constants,
        _fused_ola_constants_folded,
    )

    args = (1024, 512, 300, 700, 256, 768, 0)
    a, b, b2, _, _, Fb_kept, mask, Fb2_inv, _, _ = _fused_ola_constants(*args)
    (_, _, _, _, _, H0, n_corr, prof, fbcols, vrows, _, _) = (
        _fused_ola_constants_folded(*args)
    )
    assert n_corr == 2

    rng = np.random.default_rng(1)
    C = (rng.standard_normal((a, b)) + 1j * rng.standard_normal((a, b)))
    want = ((C @ Fb_kept.astype('complex128')) * mask) @ Fb2_inv.astype(
        'complex128'
    )
    got = C @ H0.astype('complex128')
    for s in range(n_corr):
        d = C @ fbcols[:, s].astype('complex128')
        got += (prof[:, s] * d)[:, None] * vrows[s].astype('complex128')
    # constants are float32/complex64 snapshots of float64 math
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-6
