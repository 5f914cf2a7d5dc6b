"""Real-TPU validation: run the compiled (non-interpret) paths on the chip
and compare against host oracles at float32 tolerance.

Usage: python scripts/validate_tpu.py    (requires the axon TPU)

Covers: jitted STFT/spectrogram, OLA filter pipeline, upfirdn (conv and
Pallas backends), CP correlation (XLA and Pallas), WidebandMonitor step.
All readbacks go through float32 views (the axon tunnel cannot D2H
non-f32 dtypes).
"""

import sys
import time

import numpy as np


def f32_view(x):
    """readback helper: complex64 device array -> float32 pair on host."""
    import jax.numpy as jnp

    if jnp.iscomplexobj(x):
        r = np.asarray(jnp.real(x))
        i = np.asarray(jnp.imag(x))
        return r + 1j * i
    return np.asarray(x.astype(jnp.float32))


def main():
    import jax
    import jax.numpy as jnp
    import scipy.signal

    import iqwaveform_tpu as iw
    from iqwaveform_tpu import fourier, ofdm

    print('devices:', jax.devices())
    rng = np.random.default_rng(0)
    failures = []

    def check(name, got, expected, atol):
        err = np.abs(np.asarray(got) - expected).max()
        status = 'ok' if err <= atol else 'FAIL'
        if err > atol:
            failures.append(name)
        print(f'{name:32s} max err {err:.3e} (atol {atol:g}) {status}')

    # --- STFT ---
    n = 256 * 64
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype('complex64')
    xj = jnp.asarray(x)

    Y_host = fourier.stft(
        x, fs=1e6, window='hann', nperseg=256, noverlap=128,
        return_axis_arrays=False,
    )
    stft_jit = jax.jit(
        lambda v: fourier.stft(
            v, fs=1e6, window='hann', nperseg=256, noverlap=128,
            return_axis_arrays=False,
        )
    )
    check('stft (jit, tpu)', f32_view(stft_jit(xj)), Y_host, 1e-4)

    # --- OLA filter ---
    y_host = np.asarray(
        fourier.ola_filter(
            x, fs=1e6, nfft=512, window='hamming', passband=(-2e5, 2e5)
        )
    )
    ola_jit = jax.jit(
        lambda v: fourier.ola_filter(
            v, fs=1e6, nfft=512, window='hamming', passband=(-2e5, 2e5)
        )
    )
    check('ola_filter (jit, tpu)', f32_view(ola_jit(xj)), y_host, 1e-4)

    # --- upfirdn conv + pallas ---
    h = scipy.signal.firwin(63, 0.4).astype('float32')
    exp = scipy.signal.upfirdn(h.astype('float64'), x.astype('complex128'), up=2, down=3)
    up_conv = jax.jit(lambda v: fourier.upfirdn(h, v, up=2, down=3))
    check('upfirdn conv (tpu)', f32_view(up_conv(xj)), exp, 1e-4)

    from iqwaveform_tpu.ops.pallas.upfirdn_pallas import upfirdn_pallas

    up_pl = jax.jit(lambda v: upfirdn_pallas(h, v, 2, 3))
    try:
        check('upfirdn pallas (tpu)', f32_view(up_pl(xj)), exp, 1e-4)
    except Exception as e:
        failures.append('upfirdn pallas')
        print('upfirdn pallas (tpu)            EXCEPTION:', type(e).__name__, str(e)[:100])

    # --- CP correlation ---
    phy = ofdm.Phy3GPP(1.4e6)

    sys.path.insert(0, 'tests')
    from test_ofdm import make_cp_waveform

    wave = make_cp_waveform(phy, n_slots=3)
    inds = phy.index_cyclic_prefix(slots=(0,))
    starts = np.asarray(inds).reshape(-1, inds.shape[-1])[:, 0]
    ncp = inds.shape[-1]

    ref = np.asarray(ofdm.corr_at_indices(inds, wave, phy.nfft))
    corr_jit = jax.jit(
        lambda v: ofdm.corr_at_indices(inds, v, phy.nfft)
    )
    check('corr_at_indices xla (tpu)', f32_view(corr_jit(jnp.asarray(wave))), ref, 2e-4)

    from iqwaveform_tpu.ops.pallas.corr_pallas import corr_at_indices_pallas

    try:
        got = corr_at_indices_pallas(starts, jnp.asarray(wave), phy.nfft, ncp)
        check('corr_at_indices pallas (tpu)', f32_view(got), ref, 2e-4)
    except Exception as e:
        failures.append('corr pallas')
        print('corr_at_indices pallas (tpu)    EXCEPTION:', type(e).__name__, str(e)[:100])

    # --- monitor pipeline ---
    from iqwaveform_tpu.models import WidebandMonitor, design_wideband_monitor

    design = design_wideband_monitor(
        2e6, 1e6, bw=0.8e6, channel_count=4, fft_size_per_channel=64,
        window='hamming', apd_bins=256, min_fft_size=255, fs_sdr=2e6,
    )
    mon = WidebandMonitor(design)
    m = mon.min_input_multiple() * 8
    xm = (rng.standard_normal(m) + 1j * rng.standard_normal(m)).astype('complex64')
    out_host = jax.jit(mon.step)(jnp.asarray(xm))
    psd_host = np.asarray(out_host['psd_mean'].astype(jnp.float32))
    print('monitor psd_mean finite:', np.isfinite(psd_host).all())
    if not np.isfinite(psd_host).all():
        failures.append('monitor')

    print()
    if failures:
        print('FAILURES:', failures)
        sys.exit(1)
    print('all real-TPU validations passed')


if __name__ == '__main__':
    t0 = time.time()
    main()
    print('total', round(time.time() - t0, 1), 's')
