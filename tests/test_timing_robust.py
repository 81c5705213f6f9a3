"""Unit tests for the load-robust benchmark timing protocol
(benchmarks/timing.py steady_state_robust — round-4 verdict weak #4:
the driver's loaded capture published a median 1.4x below the idle
device throughput; the robust estimator must headline the min window
under load and the median when clean)."""
from __future__ import annotations

import itertools
from unittest import mock

from benchmarks.timing import steady_state, steady_state_robust


class _Result:
    def block_until_ready(self):
        return self


def _patched_steady(fn, window_s, **kw):
    """Run fn with perf_counter patched so window k lasts window_s[k]
    seconds (cycled); returns fn's result."""
    it = itertools.cycle(window_s)
    state = {"t": 0.0}
    calls = {"n": 0}

    def fake():
        # steady_state calls perf_counter twice per window (start, end)
        calls["n"] += 1
        if calls["n"] % 2 == 0:
            state["t"] += next(it)
        return state["t"]

    with mock.patch("benchmarks.timing.time") as mtime:
        mtime.perf_counter = fake
        return fn(**kw)


def _run():
    return _Result()


def test_clean_windows_use_median():
    st = _patched_steady(steady_state_robust, [1.0, 1.0, 1.1, 1.0, 1.05],
                         run=_run, n_rep=10, n_outer=5)
    assert st["estimator"] == "median"
    assert st["retries"] == 0
    assert st["per_call_s_robust"] == st["per_call_s_median"]


def test_loaded_windows_fall_back_to_min():
    # every attempt has a 2x-inflated window -> retries exhaust, min wins
    st = _patched_steady(steady_state_robust, [1.0, 2.0, 1.0, 1.9, 1.0],
                         run=_run, n_rep=10, n_outer=5, max_retries=2)
    assert st["estimator"] == "min"
    assert st["retries"] == 2
    # min over ALL windows observed across attempts (0.1 s/call here)
    assert abs(st["per_call_s_robust"] - 0.1) < 1e-9
    assert st["per_call_s_robust"] <= st["per_call_s_median"]


def test_retry_recovers_clean_median():
    # first attempt loaded (spread 2x), second attempt clean -> median of
    # the clean set, one retry recorded
    windows = [1.0, 2.0, 1.0, 1.0, 1.0,      # attempt 1 (dirty)
               1.2, 1.2, 1.2, 1.2, 1.2]      # attempt 2 (clean)
    st = _patched_steady(steady_state_robust, windows,
                         run=_run, n_rep=10, n_outer=5, max_retries=2)
    assert st["estimator"] == "median"
    assert st["retries"] == 1
    assert abs(st["per_call_s_robust"] - 0.12) < 1e-9


def test_steady_state_reports_spread():
    st = _patched_steady(steady_state, [1.0, 3.0, 1.0, 1.0, 1.0],
                         run=_run, n_rep=10, n_outer=5)
    assert abs(st["spread_max_over_min"] - 3.0) < 1e-9
