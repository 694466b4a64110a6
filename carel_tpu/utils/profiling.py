"""Profiling helpers: jax.profiler traces + step-time meters.

The reference's only instrumentation is wall-clock minutes and a running loss
print (flagship :846-851, :990); here traces are first-class (--profile_dir
on the CLI) plus a cheap streaming step timer for throughput accounting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(profile_dir: str):
    """jax.profiler trace context; no-op when profile_dir is empty."""
    if not profile_dir:
        yield
        return
    import jax.profiler

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Streaming percentile-ish step timer (keeps the last `window` steps)."""

    def __init__(self, window: int = 200):
        self.window = window
        self.times: list = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        if len(self.times) > self.window:
            self.times.pop(0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
        }
