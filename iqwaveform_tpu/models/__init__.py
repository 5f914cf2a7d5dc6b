"""Domain analysis models: OFDM numerology/sync and analysis pipelines."""

from . import ofdm
from .cellsearch import CellSearch, CellSearchResult
from .monitor import (
    MonitorDesign,
    WidebandMonitor,
    design_wideband_monitor,
    resolve_monitor_design,
)

__all__ = [
    'CellSearch',
    'CellSearchResult',
    'MonitorDesign',
    'WidebandMonitor',
    'design_wideband_monitor',
    'ofdm',
    'resolve_monitor_design',
]
