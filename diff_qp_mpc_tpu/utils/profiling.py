"""Profiling / tracing helpers.

The reference's profiling is ad-hoc time.time() deltas and commented-out
cuda.synchronize pairs (SURVEY.md §5). Here: structured jax.profiler
traces (Perfetto-compatible), named annotations for the solver phases, and
a simple wall-clock timer that forces device completion.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace: view in Perfetto/XProf.

    with profiling.trace('/tmp/trace'):
        step(...)  # traced
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in traces (wraps TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Wall-clock timer that blocks on device work (the honest analog of
    the reference's cuda.synchronize + time.time pairs)."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - t0)

    def mean_ms(self) -> float:
        return 1e3 * sum(self.times) / max(len(self.times), 1)


def time_fn(fn, *args, n_rep: int = 10, warmup: int = 1) -> float:
    """Mean seconds per call, compile excluded."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_rep
