"""Domain analysis models: OFDM numerology/sync and analysis pipelines."""

from . import ofdm
from .monitor import MonitorDesign, WidebandMonitor, design_wideband_monitor

__all__ = ['MonitorDesign', 'WidebandMonitor', 'design_wideband_monitor', 'ofdm']
