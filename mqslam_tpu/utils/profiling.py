"""Accumulating wall-clock timers + jax profiler hooks.

The reference's only tracing facility is a global accumulating timer around
triangulation calls (reference: Work/triangulation_comparison/
triangulation_comparison.py:631-641) and per-frame prints in the SVO driver
(run_pipeline.cpp:146-149). This grows that into a named-timer registry that
blocks on device results (so device work is actually measured) plus a
convenience wrapper around jax.profiler traces.
"""

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["Timer", "timers", "trace"]


class Timer:
    """Accumulating timer; use as a context manager or start/stop."""

    def __init__(self, name=""):
        self.name = name
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.total += time.perf_counter() - self._t0
        self.count += 1
        return result

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    @property
    def mean(self):
        return self.total / max(self.count, 1)

    def __repr__(self):
        return (f"Timer({self.name!r}: total={self.total:.4f}s "
                f"n={self.count} mean={self.mean * 1e3:.2f}ms)")


class _Registry(defaultdict):
    def __init__(self):
        super().__init__(Timer)

    def __missing__(self, key):
        t = Timer(key)
        self[key] = t
        return t

    def report(self, printer=print):
        for name in sorted(self):
            printer(repr(self[name]))


timers = _Registry()


@contextlib.contextmanager
def trace(log_dir):
    """jax.profiler trace context (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
