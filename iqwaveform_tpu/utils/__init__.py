"""Core runtime: dispatch, framing, numerics, domain context, caching.

This subpackage is the TPU-native counterpart of reference util.py.
"""

from .caching import lazy_import, lru_cache, optional_import
from .dispatch import (
    array_namespace,
    is_cupy_array,
    is_jax_array,
    is_numpy_array,
    is_traced,
    pack_iq_f32,
    to_device_array,
    to_host_array,
    unpack_iq,
)
from .domain import (
    Domain,
    NonStreamContext,
    array_stream,
    get_input_domain,
    set_input_domain,
)
from .framing import (
    axis_index,
    axis_slice,
    binned_mean,
    grouped_slices_along_axis,
    grouped_views_along_axis,
    histogram_last_axis,
    iter_along_axes,
    pad_along_axis,
    sliding_window_output_shape,
    sliding_window_view,
    to_blocks,
)
from .profiling import StageTimer, fence, trace
from .numerics import (
    ceildiv,
    dtype_change_float,
    find_float_inds,
    float_dtype_like,
    isclosetoint,
    isroundmod,
)

__all__ = [
    'Domain',
    'NonStreamContext',
    'StageTimer',
    'fence',
    'trace',
    'array_namespace',
    'array_stream',
    'axis_index',
    'axis_slice',
    'binned_mean',
    'ceildiv',
    'dtype_change_float',
    'find_float_inds',
    'float_dtype_like',
    'get_input_domain',
    'grouped_slices_along_axis',
    'grouped_views_along_axis',
    'histogram_last_axis',
    'is_cupy_array',
    'is_jax_array',
    'is_numpy_array',
    'is_traced',
    'isclosetoint',
    'isroundmod',
    'iter_along_axes',
    'lazy_import',
    'lru_cache',
    'pack_iq_f32',
    'unpack_iq',
    'optional_import',
    'pad_along_axis',
    'set_input_domain',
    'sliding_window_output_shape',
    'sliding_window_view',
    'to_blocks',
    'to_device_array',
    'to_host_array',
]
