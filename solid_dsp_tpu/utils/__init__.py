"""Profiling, metrics and debug utilities."""

from .profiling import Timer, benchmark  # noqa: F401
