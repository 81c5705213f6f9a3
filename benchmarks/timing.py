"""Shared robust timing protocol for TPU kernel benchmarks.

Round-3 verdict weak #1: bench.py and roofline_fused.py each timed the
fused kernel with ONE pipelined window (10 dispatches, one trailing
block_until_ready) and published numbers that disagreed 4.7x. The
interleaved reconciliation harness (benchmarks/reconcile_throughput.py)
showed why: a single window is contaminated by host/tunnel load at
measure time — the same kernel measured 3.85M solves/s under the driver's
end-of-round CPU load and 29.8M on an idle machine, while medians over 5
interleaved windows have <= 2.5% spread.

Protocol here: n_outer independent pipelined windows per measurement,
headline = MEDIAN window, with spread (max/min) and loadavg recorded so a
loaded-machine run is visible in the artifact instead of silently
becoming the number. Every consumer of this module publishes the same
protocol, which is what makes their numbers comparable.

Two latency regimes on this axon (remote-tunnel) platform:
  - pipelined window: n_rep back-to-back dispatches, one sync. Measures
    steady-state device throughput; the per-dispatch tunnel round-trip
    (~25-30 ms) amortizes across the window.
  - per-call: sync after every dispatch. Dominated by the tunnel RTT for
    kernels under ~30 ms; reported separately as dispatch latency, never
    as kernel throughput.
"""
from __future__ import annotations

import os
import statistics
import time


def steady_state(run, n_rep: int = 10, n_outer: int = 5) -> dict:
    """Median-of-windows pipelined timing.

    run: zero-arg callable returning a jax array (already compiled/warm —
    the caller must have executed it once). Returns a dict with per-call
    seconds (median/min/max over windows) and the max/min window spread.
    """
    windows = []
    for _ in range(n_outer):
        t0 = time.perf_counter()
        r = None
        for _ in range(n_rep):
            r = run()
        r.block_until_ready()
        windows.append((time.perf_counter() - t0) / n_rep)
    return {
        "per_call_s_median": statistics.median(windows),
        "per_call_s_min": min(windows),
        "per_call_s_max": max(windows),
        "spread_max_over_min": max(windows) / min(windows),
        "n_rep": n_rep,
        "n_outer": n_outer,
        "loadavg1": os.getloadavg()[0],
    }


def per_call_latency(run, n_rep: int = 7) -> float:
    """Median sync-every-call seconds (includes one tunnel RTT)."""
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        run().block_until_ready()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)
