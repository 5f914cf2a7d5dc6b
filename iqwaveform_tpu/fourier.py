"""Reference-compatible facade for the fourier subsystem.

Mirrors the import surface of reference fourier.py so existing iqwaveform
code can switch by changing the package name. Implementations live in
iqwaveform_tpu.ops (see those modules for the TPU-native design notes).
"""

from .ops.fft import (  # noqa: F401
    CPU_COUNT,
    fft,
    fftfreq,
    ifft,
)
from .ops.fft import get_max_fft_chunk as get_max_cupy_fft_chunk  # noqa: F401
from .ops.fft import set_max_fft_chunk as set_max_cupy_fft_chunk  # noqa: F401
from .ops.filtering import (  # noqa: F401
    INF,
    OLA_MAX_FFT_SIZE,
    ResamplerDesign,
    _COLA_WINDOW_SIZE_DIVISOR,
    _find_downsample_copy_range,
    _freq_band_edges,
    _istft_buffer_size,
    _ola_filter_parameters,
    _prime_fft_sizes,
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
from .ops.mxu_fft import fft_mxu, ifft_mxu  # noqa: F401
from .ops.resample_poly import oaconvolve, upfirdn  # noqa: F401
from .ops.spectral import (  # noqa: F401
    channelize_power,
    iq_to_stft_spectrogram,
    power_spectral_density,
    time_to_frequency,
)
from .ops.stft import (  # noqa: F401
    _get_stft_axes,
    _stack_stft_windows,
    _unstack_stft_windows,
    broadcast_onto,
    istft,
    spectrogram,
    stft,
    stft_frame_count,
)
from .ops.window_design import (  # noqa: F401
    _get_window_uncached,
    equivalent_noise_bandwidth,
    find_window_param_from_enbw,
    get_window,
)
from .utils import to_blocks  # noqa: F401

# names the reference's fourier module also exposes via its own imports
# (so `from iqwaveform.fourier import X` keeps working after the rename)
from os import cpu_count  # noqa: F401

from .ops.power import stat_ufunc_from_shorthand  # noqa: F401
from .ops.windows import register_extra_windows  # noqa: F401
from .type_stubs import ArrayType  # noqa: F401
from .utils import (  # noqa: F401
    Domain,
    array_namespace,
    axis_index,
    axis_slice,
    dtype_change_float,
    find_float_inds,
    get_input_domain,
    is_cupy_array,
    isroundmod,
    lazy_import,
    lru_cache,
    pad_along_axis,
    sliding_window_view,
)

# reference fourier.py:48 module global (cupy workspace bound; the
# device-memory role is played by streaming/sharding here — see
# set_max_cupy_fft_chunk)
MAX_CUPY_FFT_SAMPLES = None
