"""Long-horizon trajectory optimization end to end (T = 4096).

SURVEY §5 names horizon-T scaling a first-class subsystem; this example
drives it through the USER-FACING solver stack rather than the kernel
benchmarks: a single-trajectory (bsz=1) pendulum swing-up solved as a
nonlinear SQP over a T=4096 horizon, with the trajectory-QP's Riccati
backend selected per run:

  * kernel="scan"    — sequential Riccati (throughput-batch default)
  * kernel="pprefix" — O(log T)-depth parallel-prefix Riccati
                       (ops/riccati_pprefix): the latency kernel for
                       small-batch long-horizon solves on TPU
  * --tsharded       — the SAME solve with the horizon axis sharded over a
                       (data, t) device mesh (ops/riccati_tsharded),
                       demonstrated on 8 virtual CPU devices (the driver
                       validates the identical path in dryrun_multichip)

Usage:
    python examples/long_horizon.py                 # TPU: scan vs pprefix
    python examples/long_horizon.py --T 8192
    python examples/long_horizon.py --tsharded      # 8-device CPU mesh

Reference context: qpth's MPC loops cap out at T≈5-30 dense QPs
(qp_wrapper.py assembles (T·n)² matrices); horizons like 4096 are simply
out of reach for the reference solver — this is a capability the TPU
rebuild adds, not just a speedup.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--T", type=int, default=4096)
    p.add_argument("--sqp_iter", type=int, default=4)
    p.add_argument("--tsharded", action="store_true",
                   help="run the horizon-sharded solve on an 8-device "
                        "virtual CPU mesh instead of the single-chip "
                        "scan/pprefix comparison")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--json", type=str, default=None,
                   help="append one result record to this JSON file "
                        "(list of rows keyed by mode/T) — the committed "
                        "end-to-end artifact for the horizon-scaling claim")
    args = p.parse_args(argv)

    if args.tsharded:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8").strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        if args.platform:
            jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.getcwd(), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp
    import numpy as np

    import diff_qp_mpc_tpu as dq
    from diff_qp_mpc_tpu.models import Pendulum
    from diff_qp_mpc_tpu.solvers import sqp_mpc
    from diff_qp_mpc_tpu.solvers.trajqp import TrajQPConfig

    T = args.T
    # fine-grained pendulum swing-up: same robot as the T=5 training tasks,
    # but planned as ONE trajectory across the whole maneuver
    model = Pendulum(dt=0.01)
    nx, nu = model.nx, model.nu
    n = nx + nu
    bsz = 1
    x0 = jnp.asarray([[np.pi, 0.0]], jnp.float32)  # hanging down
    Cd = jnp.broadcast_to(jnp.asarray([10.0, 0.1, 0.001], jnp.float32),
                          (bsz, T, n))
    cost = dq.DiagQuadCost(Cd=Cd, c=jnp.zeros((bsz, T, n), jnp.float32))
    bounds = dq.Bounds(u_lo=jnp.asarray([-2.0], jnp.float32),
                       u_hi=jnp.asarray([2.0], jnp.float32))

    if args.tsharded:
        row = run_tsharded(jax, jnp, np, model, cost, x0, bounds, T, nx, nu)
        if args.json:
            _append_row(args.json, row)
        return

    print(f"# long-horizon SQP swing-up: T={T}, bsz=1, "
          f"platform={jax.devices()[0].platform}")
    results = {}
    rows = []
    for kernel in ("scan", "pprefix"):
        cfg = sqp_mpc.SQPConfig(qp_iter=args.sqp_iter,
                                qp=TrajQPConfig(kernel=kernel, max_iter=6))
        run = jax.jit(lambda c, x: sqp_mpc.solve(
            model, c, x, bounds, cfg=cfg, differentiable=False))
        res = run(cost, x0)
        res.u.block_until_ready()  # compile + warmup
        t0 = time.perf_counter()
        for _ in range(5):
            res = run(cost, x0)
        res.u.block_until_ready()
        ms = (time.perf_counter() - t0) / 5 * 1e3
        theta_final = float(res.x[0, -1, 0])
        results[kernel] = ms
        dev = jax.devices()[0]
        mem = getattr(dev, "memory_stats", lambda: None)()
        peak = (mem or {}).get("peak_bytes_in_use", 0) / 2**20
        print(f"kernel={kernel:8s}  {ms:8.2f} ms/solve   "
              f"final theta={theta_final:+.4f}  qp_resid={float(res.qp_resid.mean()):.2e}"
              f"   peak_mem={peak:.0f} MiB")
        rows.append(dict(mode=kernel, T=T, sqp_iter=args.sqp_iter,
                         ms_per_solve=round(ms, 2),
                         final_theta=round(theta_final, 4),
                         qp_resid=float(res.qp_resid.mean()),
                         peak_mem_mib=round(peak, 1),
                         platform=jax.devices()[0].platform))
    if "scan" in results and "pprefix" in results:
        speedup = results["scan"] / results["pprefix"]
        print(f"pprefix speedup over scan: {speedup:.2f}x")
        for r in rows:
            if r["mode"] == "pprefix":
                r["speedup_over_scan"] = round(speedup, 2)
    if args.json:
        for r in rows:
            _append_row(args.json, r)


def _append_row(path, row):
    import json
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = json.load(f)
    # replace an existing row with the same (mode, T, platform) key
    key = (row["mode"], row["T"], row.get("platform"))
    rows = [r for r in rows
            if (r["mode"], r["T"], r.get("platform")) != key]
    rows.append(row)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"# wrote {path} ({len(rows)} rows)")


def run_tsharded(jax, jnp, np, model, cost, x0, bounds, T, nx, nu):
    """Same long-horizon LQR-subproblem solve with the horizon axis sharded
    over a (data, t) mesh — the multi-chip long-horizon path."""
    from jax.sharding import Mesh

    from diff_qp_mpc_tpu.ops.riccati_tsharded import make_tsharded_lqr_solver
    from diff_qp_mpc_tpu.ops import riccati

    devices = np.array(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devices, ("data", "t"))
    print(f"# T-sharded long-horizon solve: T={T} over mesh {mesh.shape}")

    bsz = 1
    rng = np.random.RandomState(0)
    dt = jnp.float32
    Cxx = jnp.broadcast_to(jnp.eye(nx, dtype=dt) * 10, (bsz, T, nx, nx))
    Cxu = jnp.zeros((bsz, T, nx, nu), dt)
    Cuu = jnp.broadcast_to(jnp.eye(nu, dtype=dt) * 0.1, (bsz, T, nu, nu))
    gx = jnp.asarray(0.1 * rng.randn(bsz, T, nx), dt)
    gu = jnp.asarray(0.1 * rng.randn(bsz, T, nu), dt)
    A = jnp.broadcast_to(jnp.eye(nx, dtype=dt) + 0.01, (bsz, T - 1, nx, nx))
    B = jnp.asarray(0.1 * rng.randn(bsz, T - 1, nx, nu), dt)
    r = jnp.zeros((bsz, T - 1, nx), dt)
    dx0 = jnp.asarray(0.1 * rng.randn(bsz, nx), dt)

    tsolve = jax.jit(make_tsharded_lqr_solver(mesh, "t", "data"))
    sol = tsolve(Cxx, Cxu, Cuu, gx, gu, A, B, r, dx0)
    sol.dx.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        sol = tsolve(Cxx, Cxu, Cuu, gx, gu, A, B, r, dx0)
    sol.dx.block_until_ready()
    ms = (time.perf_counter() - t0) / 3 * 1e3

    # exactness vs the single-device sequential solve
    ref = riccati.batched_lqr_kkt_solve(
        Cxx, Cxu, Cuu, gx, gu, A, B, r, dx0, 1e-9)
    err = float(jnp.max(jnp.abs(sol.dx - ref.dx)))
    print(f"tsharded solve: {ms:.2f} ms   max|dx - sequential| = {err:.2e}")
    assert err < 1e-4
    return dict(mode="tsharded", T=T, mesh=list(mesh.shape.values()),
                ms_per_solve=round(ms, 2), max_abs_err_vs_sequential=err,
                platform=jax.devices()[0].platform)


if __name__ == "__main__":
    main()
