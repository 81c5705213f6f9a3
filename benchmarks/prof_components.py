"""Component microbenchmarks (the prof-linear.py / prof-gurobi.py analog).

Times the solver building blocks in isolation so kernel work targets the
actual hot path:
  - batched block-tridiagonal factor+solve (ops.btsolve)
  - merit gradient/Hessian assembly incl. dynamics Jacobians (ops.almerit)
  - batched 2^-k line search (ops.newton_al)
  - full AL-MPC solve, full SQP solve
  - dense QP layer forward/backward vs a Dense layer of matched size
    (prof-linear.py:38-66 comparison)

Usage: python -m benchmarks.prof_components [--platform cpu] [--bsz 1024]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--bsz", type=int, default=1024)
    p.add_argument("--T", type=int, default=5)
    p.add_argument("--n_rep", type=int, default=20)
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import os

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.getcwd(), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import diff_qp_mpc_tpu as dq
    from diff_qp_mpc_tpu.core.types import Lambdas
    from diff_qp_mpc_tpu.models import Pendulum, step_with_jac
    from diff_qp_mpc_tpu.ops import almerit, btsolve, newton_al
    from diff_qp_mpc_tpu.solvers import al_mpc, qp, sqp_mpc
    from diff_qp_mpc_tpu.utils.profiling import time_fn

    bsz, T = args.bsz, args.T
    model = Pendulum()
    nx, nu = model.nx, model.nu
    n = nx + nu
    dt = jnp.float32
    key = jax.random.PRNGKey(0)
    results = {}

    # --- problem data ---
    x0 = 0.3 * jax.random.normal(key, (bsz, nx), dt)
    x = 0.3 * jax.random.normal(key, (bsz, T, nx), dt)
    u = 0.3 * jax.random.normal(key, (bsz, T, nu), dt)
    Cd = jnp.broadcast_to(jnp.array([10.0, 0.1, 0.001], dt), (bsz, T, n))
    cost = dq.DiagQuadCost(Cd=Cd, c=jnp.zeros((bsz, T, n), dt))
    bounds = dq.Bounds(u_lo=jnp.array([-3.0], dt), u_hi=jnp.array([3.0], dt))
    lam = Lambdas.zeros(bsz, T, nx, nu, dt)
    rho = jnp.ones((bsz, 1), dt)
    dyn_jac = step_with_jac(model.step)

    # 1. merit grad/hess assembly
    gh = jax.jit(lambda x, u: almerit.merit_grad_hess(
        cost, dyn_jac, x, u, x0, bounds, lam, rho))
    grad, D, O, _ = gh(x, u)
    results["merit_grad_hess_ms"] = 1e3 * time_fn(gh, x, u, n_rep=args.n_rep)

    # 2. block-tridiagonal factor+solve
    fs = jax.jit(lambda D, O, g: btsolve.batched_factor_solve(D, O, g, 1e-6))
    results["btsolve_ms"] = 1e3 * time_fn(fs, D, O, grad, n_rep=args.n_rep)

    # 3. line search
    xu = jnp.concatenate([x, u], axis=-1)
    upd = -fs(D, O, grad)
    merit0 = newton_al._merit_at(cost, model, xu, x0, bounds, lam, rho)
    ls = jax.jit(lambda xu, upd, m: newton_al.line_search(
        cost, model, xu, upd, m, x0, bounds, lam, rho))
    results["line_search_ms"] = 1e3 * time_fn(ls, xu, upd, merit0,
                                              n_rep=args.n_rep)

    # 4. full AL-MPC solve (reference budget)
    cfg = al_mpc.ALConfig(al_iter=2, n_newton=4, rho_max=1e4, reg=1e-5)
    state0 = dq.ALState.init(bsz, T, nx, nu, dtype=dt)
    alsolve = jax.jit(lambda x0, st: al_mpc.solve(
        model, cost, x0, bounds, st, cfg)[1])
    results["al_solve_ms"] = 1e3 * time_fn(alsolve, x0, state0,
                                           n_rep=args.n_rep)

    # 5. full SQP solve
    scfg = sqp_mpc.SQPConfig(qp_iter=3)
    sqpsolve = jax.jit(lambda x0, u0: sqp_mpc.solve(
        model, cost, x0, bounds, u0, cfg=scfg, differentiable=False).u)
    u0s = jnp.zeros((bsz, T, nu), dt)
    results["sqp_solve_ms"] = 1e3 * time_fn(sqpsolve, x0, u0s, n_rep=5)

    # 6. dense QP layer fwd/bwd vs nn.Dense-equivalent matmul
    nz, nineq, neq = 10, 8, 4
    ks = jax.random.split(key, 4)
    L = jax.random.normal(ks[0], (bsz, nz, nz), dt)
    Qm = jnp.einsum("bij,bkj->bik", L, L) + jnp.eye(nz, dtype=dt)
    pv = jax.random.normal(ks[1], (bsz, nz), dt)
    G = jax.random.normal(ks[2], (bsz, nineq, nz), dt)
    z0 = jax.random.normal(ks[3], (bsz, nz), dt)
    h = jnp.einsum("bij,bj->bi", G, z0) + 0.5
    A = jax.random.normal(ks[0], (bsz, neq, nz), dt)
    b = jnp.einsum("bij,bj->bi", A, z0)
    qp_f = jax.jit(lambda p: qp.qp_layer(Qm, p, G, h, A, b))
    results["qp_layer_fwd_ms"] = 1e3 * time_fn(qp_f, pv, n_rep=5)
    qp_g = jax.jit(jax.grad(lambda p: jnp.sum(qp.qp_layer(Qm, p, G, h, A, b) ** 2)))
    results["qp_layer_fwdbwd_ms"] = 1e3 * time_fn(qp_g, pv, n_rep=5)
    lin = jax.jit(lambda p: jnp.einsum("bij,bj->bi", Qm, p))
    results["dense_matmul_ms"] = 1e3 * time_fn(lin, pv, n_rep=args.n_rep)

    # 7. parallel-prefix vs sequential Riccati at long horizons
    from diff_qp_mpc_tpu.ops import riccati, riccati_pprefix

    for Tlong in (64, 256, 1024):
        bszl = max(1, min(bsz, 32768 // Tlong))
        kl = jax.random.split(key, 3)
        Cxx = jnp.broadcast_to(jnp.diag(jnp.array([10.0, 0.1], dt)),
                               (bszl, Tlong, nx, nx))
        Cxu = jnp.zeros((bszl, Tlong, nx, nu), dt)
        Cuu = jnp.broadcast_to(0.01 * jnp.eye(nu, dtype=dt),
                               (bszl, Tlong, nu, nu))
        gxl = 0.1 * jax.random.normal(kl[0], (bszl, Tlong, nx), dt)
        gul = 0.1 * jax.random.normal(kl[1], (bszl, Tlong, nu), dt)
        Al = jnp.broadcast_to(jnp.array([[1.0, 0.05], [0.0, 1.0]], dt),
                              (bszl, Tlong - 1, nx, nx))
        Bl = jnp.broadcast_to(jnp.array([[0.0], [0.05]], dt),
                              (bszl, Tlong - 1, nx, nu))
        rl = jnp.zeros((bszl, Tlong - 1, nx), dt)
        dx0l = 0.1 * jax.random.normal(kl[2], (bszl, nx), dt)
        argsl = (Cxx, Cxu, Cuu, gxl, gul, Al, Bl, rl, dx0l)
        # chain REPS solves inside ONE jitted program so per-solve time is
        # not swamped by dispatch latency (the axon relay costs ~60 ms per
        # call — single-call timings only measure the wire)
        REPS = 20

        def chained(solver):
            def run(Cxx, Cxu, Cuu, gx, gu, A, B, r, dx0):
                def body(g, _):
                    du = solver(Cxx, Cxu, Cuu, g, gu, A, B, r, dx0, 1e-7).du
                    return g + 1e-20 * du.sum() * jnp.ones_like(g), None

                g, _ = jax.lax.scan(body, gx, None, length=REPS)
                return g

            return jax.jit(run)

        seq = chained(riccati.batched_lqr_kkt_solve)
        par = chained(riccati_pprefix.batched_lqr_kkt_solve_pprefix)
        results[f"riccati_seq_T{Tlong}_ms"] = 1e3 * time_fn(
            seq, *argsl, n_rep=3) / REPS
        results[f"riccati_pprefix_T{Tlong}_ms"] = 1e3 * time_fn(
            par, *argsl, n_rep=3) / REPS
        results[f"riccati_T{Tlong}_bsz"] = bszl

    # 8. speed-of-light fractions from analytic FLOP counts
    from benchmarks.flops import (V5E_MXU_F32_PEAK, V5E_VPU_F32_PEAK,
                                  btsolve_flops, fused_al_flops,
                                  riccati_flops)

    on_tpu = jax.devices()[0].platform == "tpu"
    peak = V5E_MXU_F32_PEAK
    sol = {}
    bt_fl = bsz * btsolve_flops(T, n)
    sol["btsolve_gflops"] = round(bt_fl / (results["btsolve_ms"] / 1e3) / 1e9, 2)
    sol["btsolve_sol_frac_mxu_f32"] = round(
        bt_fl / (results["btsolve_ms"] / 1e3) / peak, 5)
    ric_fl = results.get("riccati_T64_bsz", 0) * riccati_flops(64, nx, nu)
    if "riccati_seq_T64_ms" in results:
        sol["riccati_seq_T64_gflops"] = round(
            ric_fl / (results["riccati_seq_T64_ms"] / 1e3) / 1e9, 2)
    fl = fused_al_flops(T=T, nx=nx, nu=nu, al_iter=2, n_newton=4, n_ls=20)
    sol["fused_al_flops_per_solve"] = fl
    sol["vpu_peak_used"] = V5E_VPU_F32_PEAK if on_tpu else None
    results["kernel_sol"] = sol

    results["bsz"] = bsz
    results["platform"] = jax.devices()[0].platform
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
