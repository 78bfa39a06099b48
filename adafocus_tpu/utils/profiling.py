"""Tracing / profiling hooks.

The reference's only instrumentation is wall-clock AverageMeters
(actnet/main_dist.py:425-426 in /root/reference). Here:
  * ``trace(dir)``: context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable device trace (XLA ops, HBM, ICI);
  * ``StepTimer``: batch-time / data-time meters matching the reference's
    ('Time', 'Data') pair, with device sync so timings are honest.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile for the enclosed steps."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """data-time (host pipeline) + step-time (device) meters."""

    def __init__(self):
        self.data_time = 0.0
        self.step_time = 0.0
        self.count = 0
        self._t = time.perf_counter()

    def data_ready(self) -> None:
        now = time.perf_counter()
        self.data_time += now - self._t
        self._t = now

    def step_done(self, result=None) -> None:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        self.step_time += now - self._t
        self._t = now
        self.count += 1

    def summary(self) -> str:
        n = max(self.count, 1)
        return (f"data {self.data_time / n * 1e3:.1f} ms/step, "
                f"step {self.step_time / n * 1e3:.1f} ms/step")
