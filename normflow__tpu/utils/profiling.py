"""Profiling and tracing hooks.

The reference has no profiling surface (only a wall-clock total printed at
the end of ``fit`` -- /root/reference/src/_normflowcore.py:265-273).  Here:

- :func:`trace` -- context manager around ``jax.profiler`` emitting an XLA
  trace viewable in TensorBoard / Perfetto;
- :func:`profile_fn` -- time a jitted callable properly (compile excluded,
  ``block_until_ready`` included);
- :class:`Timer` -- lightweight scoped wall-clock timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["trace", "profile_fn", "Timer"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/normflow_tpu_trace"):
    """Capture an XLA device trace: ``with trace('/tmp/tr'): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def profile_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2,
               **kwargs) -> dict:
    """Wall-clock a (jitted) callable.  Returns timing stats in seconds."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "min": times[0],
        "median": times[len(times) // 2],
        "mean": sum(times) / len(times),
        "iters": iters,
    }


class Timer:
    """``with Timer('fit') as t: ...`` -> prints and stores elapsed time."""

    def __init__(self, label: str = "", verbose: bool = True):
        self.label = label
        self.verbose = verbose
        self.elapsed = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.verbose:
            print(f"[{self.label}] {self.elapsed:.4g} s")
        return False
