"""Profiling / observability: throughput meters and jax.profiler traces.

The reference has no profiling subsystem (SURVEY.md §5 "Tracing/profiling":
tqdm bars only, and images/sec — the north-star metric — is never measured).
Here it is first-class: a wall-clock images/sec meter used by the scripts
and bench, plus context managers around ``jax.profiler`` for on-TPU traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class ThroughputMeter:
    """Wall-clock items/sec with warmup exclusion (the first update is
    dominated by XLA compilation)."""

    def __init__(self, skip_first: bool = True):
        self.skip_first = skip_first
        self.reset()

    def reset(self):
        self._count = 0
        self._t0: Optional[float] = None
        self._first_done = not self.skip_first
        self._total_count = 0
        self._wall_t0 = time.perf_counter()

    def update(self, n: int):
        now = time.perf_counter()
        self._total_count += n
        if not self._first_done:
            # Exclude the compile-dominated first batch from the steady rate.
            self._first_done = True
            self._t0 = now
            return
        if self._t0 is None:
            self._t0 = now
        self._count += n

    @property
    def items_per_sec(self) -> float:
        if self._t0 is None or self._count == 0:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self._count / dt if dt > 0 else 0.0

    @property
    def wall_items_per_sec(self) -> float:
        dt = time.perf_counter() - self._wall_t0
        return self._total_count / dt if dt > 0 else 0.0

    def report(self, name: str = ""):
        print(f"[THROUGHPUT] {name}: {self.items_per_sec:.2f} items/s "
              f"steady ({self.wall_items_per_sec:.2f} incl. compile), "
              f"{self._total_count} items total")


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """``jax.profiler`` trace context (view with TensorBoard/Perfetto)."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler traces."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
