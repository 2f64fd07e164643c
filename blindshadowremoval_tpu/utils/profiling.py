"""Tracing and per-step timing.

The reference has no profiling beyond wall-clock epoch prints (SURVEY.md §5).
Here timing is a first-class subsystem:

  * `StepTimer` — streaming percentiles of per-step wall time and derived
    throughput (faces/sec), the north-star metric;
  * `trace` — context manager around `jax.profiler` writing XPlane traces
    viewable in TensorBoard/XProf;
  * `device_time` — honest device-seconds measurement through the axon
    tunnel (which requires a device->host fetch to synchronize; see
    bench.py's measurement notes).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import numpy as np


class StepTimer:
    """Streaming wall-time stats for training/eval steps."""

    def __init__(self, window: int = 200):
        self.window = window
        self._times: list[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._times.append(time.perf_counter() - self._t0)
        if len(self._times) > self.window:
            self._times.pop(0)
        return False

    def stats(self, items_per_step: int = 1) -> dict:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "items_per_sec": float(items_per_step / arr.mean()),
        }


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (TensorBoard XPlane output)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn: Callable, *args, iters: int = 10) -> float:
    """Seconds per call of jitted `fn`, synchronized by a scalar fetch.

    `fn` must return something reducible to a scalar; through the axon TPU
    tunnel only a real device->host fetch waits for execution
    (block_until_ready does not), so each timing sample ends with float().
    """
    import jax.numpy as jnp

    def run():
        out = fn(*args)
        leaves = [out] if not isinstance(out, (tuple, list)) else list(out)
        return float(jnp.sum(jnp.stack([jnp.sum(x) for x in leaves])))

    run()  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    return (time.perf_counter() - t0) / iters
