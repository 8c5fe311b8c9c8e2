"""Tracing / profiling (SURVEY §5).

The reference timed loops with wall-clock prints (reference
examples/example_fcn.py:103-114, examples/input_pipeline.py:82-84). Here:
``StepTimer`` gives block_until_ready-disciplined step timing with
percentile summaries, and ``trace`` wraps ``jax.profiler`` for on-demand
XLA traces viewable in TensorBoard / xprof.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import numpy as np


class StepTimer:
    """Accurate device-step timing: sync before/after the timed region."""

    def __init__(self):
        self.times: List[float] = []

    @contextlib.contextmanager
    def time_step(self, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.times.append(time.perf_counter() - t0)

    def summary(self, skip_warmup: int = 1):
        t = np.asarray(self.times[skip_warmup:] or self.times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "min_s": float(t.min()),
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(fn, *args, warmup: int = 2, iters: int = 10) -> dict:
    """Time a jitted callable: returns per-call stats after warmup."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    timer = StepTimer()
    for _ in range(iters):
        with timer.time_step():
            out = fn(*args)
            jax.block_until_ready(out)
    return timer.summary(skip_warmup=0)
