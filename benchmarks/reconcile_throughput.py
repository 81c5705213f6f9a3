"""Reconcile the fused-kernel throughput story (round-3 verdict weak #1).

BENCH_r03.json reported 3.85M pendulum AL-MPC solves/s while
benchmarks/roofline_fused.json reported 14.7M (fori) / 18.0M (ls_unroll)
for the SAME kernel at the SAME batch (262144) and budget (al_iter=2,
n_newton=4, n_ls=20) — a 4.7x disagreement. Both harnesses used the same
protocol (pipelined loop of N_REP dispatches, one trailing
block_until_ready), so the gap has to be environmental (machine/tunnel
load at measure time) or protocol instability, not kernel behavior.

This harness settles it by running every measurement INTERLEAVED in one
process, repeated >= n_outer times, with two timing protocols:

  pipelined  — bench.py / roofline_fused.py protocol: dispatch N_REP calls
               back-to-back, block once, divide. Measures steady-state
               device throughput but is contaminated by any host/dispatch
               stall inside the window.
  per_call   — block_until_ready after every call, report the median
               call. Robust to one-off stalls; includes one dispatch
               latency per call (negligible at 262144-batch kernel times).

For each (schedule, protocol) cell it reports median/min/max over the
outer repeats, so load transients are visible as spread instead of
silently becoming the headline. Writes benchmarks/reconcile_throughput.json.

Usage:  python -m benchmarks.reconcile_throughput [--bsz 262144]
        [--n_outer 5] [--n_rep 10]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diff_qp_mpc_tpu.models import Pendulum  # noqa: E402
from diff_qp_mpc_tpu.ops.al_fused_pallas import fused_al_solve  # noqa: E402

T, NX, NU = 5, 2, 1
N = NX + NU


def build_runner(bsz, ls_unroll):
    rng = np.random.RandomState(0)
    model = Pendulum()
    x0 = jnp.asarray(np.concatenate(
        [rng.uniform(-0.25, 0.25, (bsz, 1)), rng.uniform(-0.5, 0.5, (bsz, 1))],
        axis=1), jnp.float32)
    Cd = jnp.broadcast_to(jnp.asarray([10.0, 0.1, 0.001], jnp.float32),
                          (bsz, T, N))
    c = jnp.zeros((bsz, T, N), jnp.float32)
    u_init = jnp.zeros((bsz, T, NU), jnp.float32)
    x_init = model.rollout(x0, u_init)
    lo = jnp.asarray([-3.0], jnp.float32)
    hi = jnp.asarray([3.0], jnp.float32)

    def run():
        w, *_ = fused_al_solve(model, Cd, c, x0, lo, hi, x_init, u_init,
                               al_iter=2, n_newton=4, n_ls=20, rho_max=1e4,
                               reg=1e-5, ls_unroll=ls_unroll)
        return w

    return run


def time_pipelined(run, n_rep):
    """bench.py/roofline protocol: one timing window over n_rep dispatches."""
    t0 = time.perf_counter()
    w = None
    for _ in range(n_rep):
        w = run()
    w.block_until_ready()
    return (time.perf_counter() - t0) / n_rep


def time_per_call(run, n_rep):
    """Median of per-call (dispatch + execute + sync) times."""
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        run().block_until_ready()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bsz", type=int, default=262144)
    ap.add_argument("--n_outer", type=int, default=5)
    ap.add_argument("--n_rep", type=int, default=10)
    args = ap.parse_args()

    runners = {"fori": build_runner(args.bsz, False),
               "ls_unroll": build_runner(args.bsz, True)}
    # warm up / compile both schedules before any timing window opens
    for r in runners.values():
        r().block_until_ready()

    cells = {}  # (schedule, protocol) -> list of per-solve seconds
    for outer in range(args.n_outer):
        for sched, run in runners.items():
            for proto, timer in (("pipelined", time_pipelined),
                                 ("per_call", time_per_call)):
                per = timer(run, args.n_rep)
                cells.setdefault(f"{sched}/{proto}", []).append(per)
        print(f"# outer repeat {outer + 1}/{args.n_outer} done",
              file=sys.stderr)

    out = {"bsz": args.bsz, "n_outer": args.n_outer, "n_rep": args.n_rep,
           "platform": jax.devices()[0].platform,
           "loadavg1": os.getloadavg()[0], "cells": {}}
    for k, ts in cells.items():
        med = statistics.median(ts)
        out["cells"][k] = {
            "solves_per_s_median": round(args.bsz / med, 1),
            "solves_per_s_min": round(args.bsz / max(ts), 1),
            "solves_per_s_max": round(args.bsz / min(ts), 1),
            "ms_per_batch_median": round(med * 1e3, 3),
            "spread_max_over_min": round(max(ts) / min(ts), 3),
        }
    # the reconciled headline: the slower (conservative) of the two
    # protocols' medians on the best schedule
    best_sched = max(
        ("fori", "ls_unroll"),
        key=lambda s: out["cells"][f"{s}/per_call"]["solves_per_s_median"])
    out["headline_schedule"] = best_sched
    out["headline_solves_per_s"] = min(
        out["cells"][f"{best_sched}/pipelined"]["solves_per_s_median"],
        out["cells"][f"{best_sched}/per_call"]["solves_per_s_median"])
    with open(os.path.join(HERE, "reconcile_throughput.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
