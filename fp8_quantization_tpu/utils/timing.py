"""Timing + profiling utilities.

Reference counterpart: utils/stopwatch.py (wall-clock context-manager timer).
On TPU, async dispatch means wall-clock around a jitted call measures nothing
unless the result is blocked on — ``time_jitted`` does that; ``trace`` wraps
``jax.profiler`` for kernel-level inspection (the aux subsystem SURVEY.md §5
calls for).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


class Stopwatch:
    """Wall-clock timer, usable as a context manager (stopwatch.py:9-83)."""

    def __init__(self):
        self._start = None
        self.elapsed = 0.0

    def start(self):
        self._start = time.perf_counter()
        return self

    def stop(self):
        if self._start is not None:
            self.elapsed += time.perf_counter() - self._start
            self._start = None
        return self.elapsed

    def reset(self):
        self._start, self.elapsed = None, 0.0

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


def time_jitted(fn: Callable, *args, iters: int = 10, warmup: int = 3,
                **kwargs) -> float:
    """Mean seconds per call of a jitted fn, device-synchronized."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: Optional[str] = "/tmp/fp8tpu_trace"):
    """jax.profiler trace around a block (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
