"""iqwaveform-tpu: TPU-native complex-IQ waveform DSP framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
``iqwaveform`` (reference __init__.py:1-41 defines this public surface).
Every public function accepts numpy arrays (host/eager, scipy-matched
numerics) or jax arrays (device, traceable inside jax.jit), and the
``parallel`` subpackage scales the pipelines across a TPU mesh.
"""

__version__ = '0.1.0'

from . import fourier, io, ofdm, power_analysis, util, windows  # noqa: F401
from . import models, ops, parallel, utils  # noqa: F401
from .utils import lazy_import as _lazy_import

figures = _lazy_import('iqwaveform_tpu.figures')

from .fourier import (  # noqa: F401
    design_fir_lpf,
    design_cola_resampler,
    equivalent_noise_bandwidth,
    fftfreq,
    find_window_param_from_enbw,
    get_window,
    get_max_cupy_fft_chunk,
    iq_to_stft_spectrogram,
    istft,
    oaconvolve,
    oaresample,
    power_spectral_density,
    resample,
    set_max_cupy_fft_chunk,
    stft,
    to_blocks,
)

from .io import waveform_to_frame  # noqa: F401

from .power_analysis import (  # noqa: F401
    dBtopow,
    dBlinmean,
    dBlinsum,
    envtodB,
    envtopow,
    iq_to_bin_power,
    iq_to_cyclic_power,
    power_histogram_along_axis,
    powtodB,
    sample_ccdf,
)

from .util import histogram_last_axis, isroundmod  # noqa: F401
