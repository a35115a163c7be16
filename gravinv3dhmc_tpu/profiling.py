"""Structured timing and device profiling.

Replaces the reference's ad-hoc ``time.time()`` brackets and psutil probes
(SURVEY.md §5; reference: inversion/potential.py:102-105,
example/uniformgrid/main_uniform.py:92-95,127-131) with a reusable timer
registry and a ``jax.profiler`` trace context for XLA-level inspection.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class Timers:
    """Named wall-clock accumulators with JSON export.

    >>> timers = Timers()
    >>> with timers("kernel_build"):
    ...     pass
    >>> "kernel_build" in timers.summary()
    True
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self):
        return {name: {"total_s": round(self.totals[name], 6),
                       "count": self.counts[name],
                       "mean_s": round(self.totals[name]
                                       / max(self.counts[name], 1), 6)}
                for name in self.totals}

    def report(self):
        return json.dumps(self.summary())


#: process-global default registry
timers = Timers()


@contextlib.contextmanager
def device_trace(logdir="/tmp/jax-trace"):
    """Capture a jax.profiler trace (viewable in TensorBoard/XProf) around
    a block of device work."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def memory_report():
    """Host + device memory snapshot (the reference printed psutil RSS,
    example/uniformgrid/main_uniform.py:92-95)."""
    out = {}
    try:
        import psutil
        p = psutil.Process()
        out["host_rss_gb"] = round(p.memory_info().rss / 1024 ** 3, 3)
        out["host_total_gb"] = round(
            psutil.virtual_memory().total / 1024 ** 3, 2)
    except Exception:
        pass
    try:
        import jax
        for d in jax.devices():
            stats = d.memory_stats() or {}
            if "bytes_in_use" in stats:
                out[f"{d}"] = {
                    "bytes_in_use_gb": round(
                        stats["bytes_in_use"] / 1024 ** 3, 3),
                    "peak_gb": round(
                        stats.get("peak_bytes_in_use", 0) / 1024 ** 3, 3),
                }
    except Exception:
        pass
    return out
