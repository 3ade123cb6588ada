"""Utility coverage: step timer and profiler trace context."""

import os
import time

from video_moment_localization_tpu.utils.profiling import StepTimer, trace_context


def test_step_timer_accumulates_throughput():
    t = StepTimer()
    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop(5)
    assert t.samples == 15
    assert t.seconds >= 0.03
    assert 0 < t.throughput < 15 / 0.03
    t.reset()
    assert t.samples == 0 and t.throughput == 0.0


def test_trace_context_noop_without_dir():
    with trace_context(None):
        pass  # must not start the profiler


def test_trace_context_writes_trace(tmp_path):
    out = str(tmp_path / "trace")
    with trace_context(out):
        import jax.numpy as jnp

        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    # jax.profiler writes a plugins/profile tree under the directory
    found = []
    for root, _, files in os.walk(out):
        found.extend(files)
    assert found, "profiler trace directory is empty"
