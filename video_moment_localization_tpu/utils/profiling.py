"""Profiling hooks and throughput meters.

The reference has no tracing/profiling beyond wall-clock prints
(SURVEY.md §5.1). Here: a `jax.profiler` trace context (view with
TensorBoard / xprof) and a step timer reporting the north-star metric —
query-video pairs processed per second per chip.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_context(profile_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into `profile_dir` when set."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates step wall time and sample counts -> throughput."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._samples = 0
        self._elapsed = 0.0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, num_samples: int) -> None:
        assert self._t0 is not None, "StepTimer.stop() without start()"
        self._elapsed += time.perf_counter() - self._t0
        self._samples += num_samples
        self._t0 = None

    @property
    def seconds(self) -> float:
        return self._elapsed

    @property
    def samples(self) -> int:
        return self._samples

    @property
    def throughput(self) -> float:
        """Samples (query-video pairs) per second."""
        return self._samples / self._elapsed if self._elapsed > 0 else 0.0
