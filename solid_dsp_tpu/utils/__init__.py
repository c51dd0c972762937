"""Profiling, metrics and debug utilities."""

from .profiling import Timer, benchmark, trace, emit_metric  # noqa: F401
from .metrics import BlockMetrics, MetricsCollector, rssi_db  # noqa: F401
from . import sequences, bits  # noqa: F401
