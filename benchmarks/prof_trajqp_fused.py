"""Fused trajectory-QP IPM kernel vs the XLA scan IPM on TPU.

Measured on TPU v5e (2026-08-17, f32, T=5, 12 Mehrotra iterations,
10-rep steady state, max |u| disagreement ≤ 1.4e-3):

    B=4096,  nx=2, nu=1: scan  619.5 ms (6.6k/s)  fused 3.71 ms (1.10M/s) 167x
    B=16384, nx=2, nu=1: scan 2474.8 ms (6.6k/s)  fused 3.35 ms (4.89M/s) 738x
    B=4096,  nx=4, nu=1: scan 1129.5 ms (3.6k/s)  fused 2.89 ms (1.42M/s) 390x

The scan IPM is latency-bound on TPU (hundreds of tiny batched cholesky /
triangular ops per iteration); the fused kernel runs the whole IPM in VMEM
per (8,128) batch tile. Select via TrajQPConfig.kernel="fused".

Usage: python -m benchmarks.prof_trajqp_fused  (TPU)
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.getcwd(), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from diff_qp_mpc_tpu.core.types import Bounds  # noqa: E402
from diff_qp_mpc_tpu.solvers import trajqp  # noqa: E402
from diff_qp_mpc_tpu.solvers.trajqp import TrajQPConfig  # noqa: E402


def bench(B, T, nx, nu, max_iter=12):
    n = nx + nu
    rng = np.random.RandomState(0)
    dt = jnp.float32
    Cd = np.concatenate([np.full(nx, 10.0), np.full(nu, 0.1)])
    C = jnp.broadcast_to(jnp.asarray(np.diag(Cd), dt), (B, T, n, n))
    c = jnp.asarray(0.3 * rng.randn(B, T, n), dt)
    A = jnp.broadcast_to(jnp.asarray(np.eye(nx) + 0.05, dt),
                         (B, T - 1, nx, nx))
    Bm = jnp.asarray(0.2 * rng.randn(B, T - 1, nx, nu), dt)
    f = jnp.asarray(0.05 * rng.randn(B, T - 1, nx), dt)
    x0 = jnp.asarray(0.4 * rng.randn(B, nx), dt)
    bounds = Bounds(u_lo=jnp.full((nu,), -1.5, dt),
                    u_hi=jnp.full((nu,), 1.5, dt))
    out, u_ref = {}, None
    for kern in ("scan", "fused"):
        cfg = TrajQPConfig(max_iter=max_iter, reg=1e-7, kernel=kern)
        fsolve = jax.jit(
            lambda c_, cfg=cfg: trajqp.solve(C, c_, A, Bm, f, x0, bounds,
                                             cfg).u)
        u = fsolve(c)
        u.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            u = fsolve(c)
        u.block_until_ready()
        out[kern] = (time.perf_counter() - t0) / 10
        if kern == "scan":
            u_ref = u
        else:
            print(f"B={B} nx={nx}: max|u diff| "
                  f"{float(jnp.abs(u - u_ref).max()):.2e}", flush=True)
    print(f"B={B} T={T}: scan {out['scan']*1e3:.2f} ms ({B/out['scan']:.0f}/s)"
          f"  fused {out['fused']*1e3:.2f} ms ({B/out['fused']:.0f}/s)"
          f"  speedup {out['scan']/out['fused']:.1f}x", flush=True)


if __name__ == "__main__":
    bench(4096, 5, 2, 1)
    bench(16384, 5, 2, 1)
    bench(4096, 5, 4, 1)
