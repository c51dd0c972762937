"""Timers, throughput benchmarking and roofline counters.

The reference has no tracing/profiling at all (SURVEY.md §5); this module is
the framework's observability layer: wall-clock timing with device sync,
samples/s + GFLOP/s reporting, and optional jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field

import jax

__all__ = ["Timer", "benchmark", "trace"]


@dataclass
class Timer:
    """Accumulating wall-clock timer with device synchronization."""

    name: str = "timer"
    total: float = 0.0
    count: int = 0
    _t0: float = field(default=0.0, repr=False)

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


def _block(x):
    return jax.block_until_ready(x)


def benchmark(fn, *args, warmup: int = 2, iters: int = 10, samples: int | None = None):
    """Time a jitted function; returns dict with seconds and samples/s.

    ``samples``: number of stream samples processed per call, for throughput.
    """
    for _ in range(warmup):
        _block(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _block(out)
    dt = (time.perf_counter() - t0) / iters
    res = {"seconds_per_call": dt}
    if samples is not None:
        res["samples_per_second"] = samples / dt
        res["msamples_per_second"] = samples / dt / 1e6
    return res


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace around a block of work."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def emit_metric(metric: str, value: float, unit: str, vs_baseline: float):
    """Print the single-line JSON metric format the bench driver expects."""
    print(
        json.dumps(
            {
                "metric": metric,
                "value": value,
                "unit": unit,
                "vs_baseline": vs_baseline,
            }
        )
    )
