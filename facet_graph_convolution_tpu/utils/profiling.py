"""Profiling helpers: jax.profiler traces and per-step throughput.

The north-star metric is edges/s/chip on the facet-conv fwd+bwd (SURVEY.md
§6); the reference only ever printed wall-clock stage times
(dataClasses.py:39-66, infer.py:87,98).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """Wall-clock timer with warmup discard and summary stats."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")


@contextlib.contextmanager
def trace_context(log_dir: Optional[str] = None):
    """``jax.profiler`` trace scope; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def edges_per_second(num_edges: int, step_seconds: float) -> float:
    return num_edges / step_seconds if step_seconds > 0 else float("inf")
