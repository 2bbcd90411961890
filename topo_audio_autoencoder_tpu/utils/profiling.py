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


def fetch_scalar(out) -> float:
    """Force TRUE completion of ``out`` by fetching one element to host.

    ``jax.block_until_ready`` can return before execution finishes on some
    remote PJRT transports (measured on the axon tunnel: 50 *chained*
    4096^3 f32 matmuls "completed" in 1 ms — a physical impossibility; a
    calibrated chain-length sweep with scalar fetches recovers the chip's
    true ~190 bf16 TFLOP/s). A device->host read of any element cannot
    return early: it needs the bytes.
    """
    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "ravel")]
    smallest = min(leaves, key=lambda l: getattr(l, "size", 1))
    return float(np.asarray(smallest.ravel()[:1])[0])


def time_fn(fn, *args, warmup: int = 2, iters: int = 10, **kwargs) -> dict:
    """Wall-clock a jitted function, completion forced by a scalar fetch.

    Per-call times INCLUDE one host round-trip (the fetch); for sub-ms
    device work prefer ``chain_time``, which cancels that constant out.
    Returns {'p50', 'mean', 'min', 'max'} in seconds per call.
    """
    for _ in range(warmup):
        fetch_scalar(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch_scalar(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {
        "p50": float(np.median(times)),
        "mean": float(times.mean()),
        "min": float(times.min()),
        "max": float(times.max()),
    }


def chain_time(make_step, k1: int = 5, k2: int = 25, warmup: int = 3) -> float:
    """True per-call device time via a chain-length slope.

    ``make_step()`` returns a ``step(i) -> out`` closure whose calls are
    SEQUENTIALLY DEPENDENT (each consumes the previous output/state). Two
    chain lengths are run, each terminated by a scalar fetch; the slope
    (T2 - T1) / (k2 - k1) cancels the fixed dispatch + fetch round-trip —
    robust even where ``block_until_ready`` lies (see ``fetch_scalar``).
    """
    step = make_step()
    out = None
    for i in range(warmup):
        out = step(i)
    if out is not None:  # warmup=0: nothing in flight to drain
        fetch_scalar(out)

    def run(k):
        step = make_step()
        t0 = time.perf_counter()
        out = None
        for i in range(k):
            out = step(i)
        fetch_scalar(out)
        return time.perf_counter() - t0

    t1 = run(k1)
    t2 = run(k2)
    return max((t2 - t1) / (k2 - k1), 1e-9)


def wait_for_backend(
    max_wait: float,
    *,
    platform: str | None = None,
    poll: float = 30.0,
    probe_timeout: float = 120.0,
    log=None,
) -> bool:
    """Wait out a transient accelerator-backend outage; True if reachable.

    A killed-mid-compile client can wedge the remote-TPU tunnel for
    minutes, and a pool outage surfaces as UNAVAILABLE (or a multi-minute
    hang) at PJRT client init. Probing runs ``jax.devices()`` in a
    SUBPROCESS so a hung init can be timed out without poisoning the
    calling process's backend state; once a probe succeeds, the caller's
    own init hits a live tunnel. ``platform`` overrides the probed
    backend via ``jax.config`` (env vars alone are beaten by the site
    plugin's programmatic config — CLAUDE.md); tests probe ``cpu``.
    """
    import subprocess
    import sys as _sys

    code = "import jax; "
    if platform:
        code += f"jax.config.update('jax_platforms', {platform!r}); "
    code += "jax.devices()"
    deadline = time.time() + max_wait
    attempt = 0
    while True:
        attempt += 1
        budget = deadline - time.time()
        if budget <= 0:
            break
        try:
            proc = subprocess.run(
                [_sys.executable, "-c", code],
                capture_output=True,
                timeout=min(probe_timeout, max(10.0, budget)),
            )
            if proc.returncode == 0:
                if log and attempt > 1:
                    log(f"backend reachable (probe attempt {attempt})")
                return True
            if log:
                log(f"backend probe {attempt} failed (rc={proc.returncode})")
        except subprocess.TimeoutExpired:
            if log:
                log(f"backend probe {attempt} timed out")
        time.sleep(min(poll, max(0.0, deadline - time.time())))
    if log:
        log(f"backend still unreachable after {max_wait:.0f}s")
    return False
