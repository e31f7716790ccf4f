"""Tracing / profiling hooks (reference has none — SURVEY.md §5.1 gap-fill).

`trace(dir)` wraps a region in a jax.profiler trace viewable in TensorBoard /
Perfetto; `StepTimer` provides steps/sec and windows/sec/chip counters for the
benchmark harness and the trainer's ETA lines.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Profile the enclosed region; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + windows/sec/chip counter."""

    def __init__(self, window_batch: int = 0):
        self.window_batch = window_batch
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self, n: int = 1) -> None:
        self._steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0

    @property
    def windows_per_sec_per_chip(self) -> float:
        return self.steps_per_sec * self.window_batch / max(jax.device_count(), 1)
