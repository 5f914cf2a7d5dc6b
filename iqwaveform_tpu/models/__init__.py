"""Domain analysis models: OFDM numerology/sync and analysis pipelines."""

from . import ofdm
from .cellsearch import CellSearch, CellSearchResult
from .monitor import MonitorDesign, WidebandMonitor, design_wideband_monitor

__all__ = [
    'CellSearch',
    'CellSearchResult',
    'MonitorDesign',
    'WidebandMonitor',
    'design_wideband_monitor',
    'ofdm',
]
