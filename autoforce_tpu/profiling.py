"""Profiling / tracing helpers (aux subsystem, SURVEY.md §5).

The reference stamps wall-clock nodes per calculate() (active.py:426-533;
our ActiveCalculator mirrors that with report_timings=True).  For device-
level analysis this module adds the jax profiler (TensorBoard traces) and
a tiny phase stopwatch.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir="jax_trace"):
    """Capture a TensorBoard/perfetto device trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Accumulating phase timer (reference per-rank stopwatch idiom,
    cl/__init__.py:73-89)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, phase):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[phase] += time.perf_counter() - t0
            self.counts[phase] += 1

    def report(self):
        return {
            k: {"total_s": v, "calls": self.counts[k],
                "mean_ms": 1e3 * v / max(self.counts[k], 1)}
            for k, v in sorted(self.totals.items())
        }
