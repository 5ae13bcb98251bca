"""Profiling / timing harness.

Parity role: the reference's observability is an ``AudioProcessLoadMeasurer``
around every block plus a google-benchmark binary (SURVEY.md §5).  Here:

- :class:`Timer` — steady-state wall timing of jitted callables with proper
  device sync and input rotation (defeats caching; the google-benchmark role);
- :func:`trace` — context manager around ``jax.profiler`` for on-device
  traces viewable in TensorBoard/XProf;
- :func:`device_memory_stats` — live HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional, Sequence

import jax


class Timer:
    """Benchmark a jitted callable: warmup + n pipelined calls + sync."""

    def __init__(self, warmup: int = 2, iters: int = 20):
        self.warmup = warmup
        self.iters = iters

    def time(self, fn: Callable, args_list: Sequence[tuple]) -> Dict[str, float]:
        for i in range(self.warmup):
            out = fn(*args_list[i % len(args_list)])
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        t0 = time.perf_counter()
        for i in range(self.iters):
            out = fn(*args_list[i % len(args_list)])
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        dt = (time.perf_counter() - t0) / self.iters
        return {"mean_s": dt, "mean_ms": dt * 1e3}

    def throughput(self, fn, args_list, items_per_call: int) -> Dict[str, float]:
        r = self.time(fn, args_list)
        r["items_per_s"] = items_per_call / r["mean_s"]
        return r


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/diffwdf_trace"):
    """Capture an on-device profiler trace around the with-block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Optional[Dict[str, Any]]:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", None)
    return stats() if callable(stats) else None


def enable_nan_checks(on: bool = True):
    """Solver-divergence guard (the framework's analogue of the reference's
    jasserts): makes any NaN in a jitted computation raise immediately."""
    jax.config.update("jax_debug_nans", on)
