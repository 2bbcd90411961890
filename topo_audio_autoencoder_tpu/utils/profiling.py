"""Profiling + step timing utilities.

The reference imports torch.profiler but never invokes it (SURVEY §5.1);
actual visibility is print-based. Here: real ``jax.profiler`` trace capture
plus ``block_until_ready``-timed step benchmarks — the tools the perf work
in this repo actually uses.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, warmup: int = 2, iters: int = 10, **kwargs) -> dict:
    """Wall-clock a jitted function with proper device synchronization.

    Returns {'p50', 'mean', 'min', 'max'} in seconds per call.
    """
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {
        "p50": float(np.median(times)),
        "mean": float(times.mean()),
        "min": float(times.min()),
        "max": float(times.max()),
    }
