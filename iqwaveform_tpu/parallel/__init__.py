"""Multi-chip sharding: mesh helpers, halo-exchange framing, streaming
reductions."""

from .mesh import TIME_AXIS, pad_to_shard_multiple, shard_time_axis, time_mesh
from .sharded import (
    ccdf_from_counts,
    columnwise_histogram,
    sharded_channelize_power,
    quantile_from_histogram,
    sharded_apd_histogram,
    sharded_ola_filter,
    sharded_psd_stats,
    sharded_spectrogram,
    sharded_stft,
)
from .streaming import (
    PersistenceCarry,
    apd_fold,
    design_persistence,
    load_carry,
    persistence_apd_fold,
    persistence_finalize,
    persistence_flush,
    persistence_fold,
    persistence_init,
    save_carry,
    streaming_apd,
    streaming_persistence_spectrum,
)

__all__ = [
    'PersistenceCarry',
    'apd_fold',
    'design_persistence',
    'persistence_apd_fold',
    'persistence_finalize',
    'persistence_flush',
    'persistence_fold',
    'persistence_init',
    'load_carry',
    'save_carry',
    'TIME_AXIS',
    'ccdf_from_counts',
    'columnwise_histogram',
    'pad_to_shard_multiple',
    'quantile_from_histogram',
    'shard_time_axis',
    'sharded_apd_histogram',
    'sharded_channelize_power',
    'sharded_ola_filter',
    'sharded_psd_stats',
    'sharded_spectrogram',
    'sharded_stft',
    'streaming_apd',
    'streaming_persistence_spectrum',
    'time_mesh',
]
