"""Profiling / tracing.

Role gap vs the reference (SURVEY.md §5: the reference has only throughput
counters): first-class `jax.profiler` integration — traces land in the
experiment's TensorBoard logdir (profile plugin is installed) and can be
inspected for HLO timings, HBM usage, and fusion decisions.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace for the enclosed block:

        with profiling.trace("results/exp/tb"):
            trainer.run(20)
    """
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Per-device HBM usage (bytes), where the backend reports it."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
