"""DSP transforms: windows, FFT, STFT/ISTFT, filtering, power analysis."""

from . import fft, filtering, mxu_fft, power, resample_poly, spectral, stft, window_design, windows
from .fft import fftfreq, get_max_fft_chunk, ifft, set_max_fft_chunk
from .mxu_fft import fft_mxu, fused_ola_mxu, ifft_mxu
from .fft import fft as fft_fn
from .filtering import (
    ResamplerDesign,
    design_cola_resampler,
    design_fir_lpf,
    design_fir_resampler,
    downsample_stft,
    oaresample,
    ola_filter,
    resample,
    stft_fir_lowpass,
    time_fftshift,
    time_ifftshift,
    zero_stft_by_freq,
)
from .power import (
    binned_mean_matmul,
    dBlinmean,
    dBlinsum,
    dBtopow,
    envtodB,
    envtopow,
    iq_to_bin_power,
    iq_to_cyclic_power,
    iq_to_frame_power,
    power_histogram_along_axis,
    powtodB,
    sample_ccdf,
    stat_ufunc_from_shorthand,
    unstack_series_to_bins,
)
from .resample_poly import oaconvolve, upfirdn, upfirdn_output_len
from .spectral import (
    channelize_power,
    iq_to_stft_spectrogram,
    power_spectral_density,
    time_to_frequency,
)
from .stft import broadcast_onto, istft, spectrogram, stft as stft_fn  # noqa: F401
from .stft import stft_frame_count
from .window_design import (
    equivalent_noise_bandwidth,
    find_window_param_from_enbw,
    get_window,
)
from .windows import acg, cosh, knab, modified_bessel, register_extra_windows
