"""Reference-compatible facade for power_analysis (reference
power_analysis.py). Implementations live in iqwaveform_tpu.ops.power."""

from .ops.power import (  # noqa: F401
    histogram_edge_counts,
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
    unit_dB_to_linear,
    unit_dB_to_wave,
    unit_linear_to_dB,
    unit_wave_to_dB,
    unit_wave_to_linear,
    unstack_series_to_bins,
)
