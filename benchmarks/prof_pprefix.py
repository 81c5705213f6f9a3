"""Sequential-scan vs parallel-prefix Riccati on TPU — the crossover map.

Measured on TPU v5e (2026-08-17, f32, nx=3, nu=1, 10 solves chained
inside one jitted scan to amortize the ~60 ms dispatch relay):

    T=256   bsz=4 : seq   8.56 ms   pprefix  6.17 ms   1.39x
    T=1024  bsz=4 : seq  25.80 ms   pprefix 14.98 ms   1.72x
    T=4096  bsz=4 : seq  93.98 ms   pprefix 50.83 ms   1.85x
    T=4096  bsz=1 : seq  62.38 ms   pprefix 14.76 ms   4.23x
    T=16384 bsz=1 : seq 240.14 ms   pprefix 49.91 ms   4.81x

At LARGE batch (≥128) the batch axis already saturates the chip and the
sequential scan pipelines across batch, so pprefix's O(log T) depth buys
nothing (prof_components riccati_seq/pprefix rows) — select
kernel="pprefix" for the latency-critical small-batch long-horizon
regime (real-time MPC, T ≳ 256), kernel="scan" for throughput batches.

Usage: python -m benchmarks.prof_pprefix   (TPU; ~10 min of compiles,
cached in .jax_cache)
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.getcwd(), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from diff_qp_mpc_tpu.ops import riccati, riccati_pprefix  # noqa: E402


def bench(T, bsz, REPS=10):
    nx, nu = 3, 1
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

    def chained(solver):
        def run(gx):
            def body(g, _):
                du = solver(Cxx, Cxu, Cuu, g, gu, A, B, r, dx0, 1e-6).du
                return g + 1e-20 * du.sum() * jnp.ones_like(g), None

            g, _ = jax.lax.scan(body, gx, None, length=REPS)
            return g

        return jax.jit(run)

    out = {}
    for name, solver in [
            ("seq", riccati.batched_lqr_kkt_solve),
            ("pprefix", riccati_pprefix.batched_lqr_kkt_solve_pprefix)]:
        f = chained(solver)
        f(gx).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            f(gx).block_until_ready()
        out[name] = (time.perf_counter() - t0) / 3 / REPS * 1e3
    out["speedup"] = out["seq"] / out["pprefix"]
    return out


def main():
    results = {}
    for T, bsz in [(256, 4), (1024, 4), (4096, 4), (4096, 1), (16384, 1)]:
        r = bench(T, bsz)
        results[f"T{T}_bsz{bsz}"] = {k: round(v, 2) for k, v in r.items()}
        print(f"T={T} bsz={bsz}: seq {r['seq']:.2f} ms  "
              f"pprefix {r['pprefix']:.2f} ms  {r['speedup']:.2f}x",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
