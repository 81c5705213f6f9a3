"""Dense vs Q-prefactored PDIPM at the reference's OptNet profiling sizes
(prof-gurobi.py:37-50: nz = 100, nineq = 100, neq = 0, bsz ∈ {1, 64, 128})
— the measurement VERDICT r1 asked for to settle whether the reference's
pre_factor_kkt scheme (batch.py:377-428) matters on TPU.

Usage: python -m benchmarks.prof_qp_sizes [--platform cpu]
Prints one JSON object with ms per solve for both paths per batch size.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--n_rep", type=int, default=5)
    p.add_argument("--nz", type=int, default=100)
    p.add_argument("--nineq", type=int, default=100)
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu":
            jax.config.update("jax_enable_x64", True)

    from diff_qp_mpc_tpu.solvers.qp import QPConfig, qp_solve
    from diff_qp_mpc_tpu.utils.profiling import time_fn

    nz, nineq, neq = args.nz, args.nineq, 0
    results = {"nz": nz, "nineq": nineq,
               "platform": jax.devices()[0].platform}
    key = jax.random.PRNGKey(0)
    for bsz in (1, 64, 128):
        ks = jax.random.split(jax.random.fold_in(key, bsz), 5)
        dt = jnp.float32 if results["platform"] == "tpu" else jnp.float64
        L = jax.random.uniform(ks[0], (bsz, nz, nz), dt)
        Q = jnp.einsum("bij,bkj->bik", L, L) + 1e-3 * jnp.eye(nz, dtype=dt)
        G = jax.random.normal(ks[1], (bsz, nineq, nz), dt)
        z0 = jax.random.normal(ks[2], (bsz, nz), dt)
        s0 = jax.random.uniform(ks[3], (bsz, nineq), dt)
        pv = jax.random.normal(ks[4], (bsz, nz), dt)
        h = jnp.einsum("bij,bj->bi", G, z0) + s0
        A = jnp.zeros((bsz, neq, nz), dt)
        b = jnp.zeros((bsz, neq), dt)

        for solver in ("dense", "prefactor"):
            cfg = QPConfig(solver=solver)
            f = jax.jit(lambda pv, cfg=cfg: qp_solve(Q, pv, G, h, A, b, cfg))
            sol = f(pv)
            ms = 1e3 * time_fn(f, pv, n_rep=args.n_rep)
            results[f"{solver}_bsz{bsz}_ms"] = round(ms, 3)
            results[f"{solver}_bsz{bsz}_resid"] = float(sol.resids.mean())
    for bsz in (1, 64, 128):
        results[f"speedup_bsz{bsz}"] = round(
            results[f"dense_bsz{bsz}_ms"]
            / results[f"prefactor_bsz{bsz}_ms"], 2)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
