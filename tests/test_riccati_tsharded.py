"""Horizon-sharded Riccati vs the single-chip sequential scan.

Validates the distributed-scan decomposition (local associative scan +
aggregate all-gather + seeded finish) on the 8-virtual-device CPU mesh:
1-D horizon mesh and a 2-D batch x horizon mesh, against
ops.riccati.batched_lqr_kkt_solve, plus KKT-residual optimality.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from diff_qp_mpc_tpu.ops.riccati import (batched_lqr_kkt_solve,
                                         kkt_residual, lqr_kkt_solve)
from diff_qp_mpc_tpu.ops.riccati_tsharded import make_tsharded_lqr_solver


def _rand_problem(key, B, T, nx, nu, dt=jnp.float64):
    ks = jax.random.split(key, 9)
    q = jax.random.normal(ks[0], (B, T, nx, nx), dt)
    Cxx = jnp.einsum("btij,btkj->btik", q, q) + 0.5 * jnp.eye(nx, dtype=dt)
    ru = jax.random.normal(ks[1], (B, T, nu, nu), dt)
    Cuu = jnp.einsum("btij,btkj->btik", ru, ru) + 0.5 * jnp.eye(nu, dtype=dt)
    Cxu = 0.1 * jax.random.normal(ks[2], (B, T, nx, nu), dt)
    gx = jax.random.normal(ks[3], (B, T, nx), dt)
    gu = jax.random.normal(ks[4], (B, T, nu), dt)
    A = jnp.eye(nx, dtype=dt) + 0.1 * jax.random.normal(
        ks[5], (B, T - 1, nx, nx), dt)
    Bm = 0.3 * jax.random.normal(ks[6], (B, T - 1, nx, nu), dt)
    r = 0.1 * jax.random.normal(ks[7], (B, T - 1, nx), dt)
    dx0 = jax.random.normal(ks[8], (B, nx), dt)
    return Cxx, Cxu, Cuu, gx, gu, A, Bm, r, dx0


@pytest.mark.parametrize("mesh_shape,axes", [
    ((8,), ("t",)),           # pure horizon sharding
    ((2, 4), ("data", "t")),  # batch x horizon
])
def test_tsharded_matches_scan(mesh_shape, axes):
    devs = np.array(jax.devices()[:int(np.prod(mesh_shape))])
    mesh = Mesh(devs.reshape(mesh_shape), axes)
    data_axis = "data" if "data" in axes else None
    B, T, nx, nu = 4, 16, 3, 2
    prob = _rand_problem(jax.random.PRNGKey(0), B, T, nx, nu)
    ref = batched_lqr_kkt_solve(*prob, 0.0)
    solve = jax.jit(make_tsharded_lqr_solver(mesh, "t", data_axis))
    out = solve(*prob)
    np.testing.assert_allclose(out.dx, ref.dx, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(out.du, ref.du, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(out.lam, ref.lam, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(out.K, ref.K, rtol=1e-8, atol=1e-9)


def test_tsharded_kkt_optimality():
    mesh = Mesh(np.array(jax.devices()[:4]), ("t",))
    B, T, nx, nu = 2, 8, 4, 2
    prob = _rand_problem(jax.random.PRNGKey(3), B, T, nx, nu)
    solve = jax.jit(make_tsharded_lqr_solver(mesh, "t", None))
    out = solve(*prob)
    for b in range(B):
        sol_b = jax.tree.map(lambda x, b=b: x[b], out)
        st_x, st_u, feas, feas0 = kkt_residual(
            *jax.tree.map(lambda x, b=b: x[b], prob), sol_b)
        assert float(jnp.max(jnp.abs(st_x))) < 1e-8
        assert float(jnp.max(jnp.abs(st_u))) < 1e-8
        assert float(jnp.max(jnp.abs(feas))) < 1e-8
        assert float(jnp.max(jnp.abs(feas0))) < 1e-12


def test_tsharded_with_reg_matches_sequential_reg():
    """Levenberg damping enters via Cuu exactly as the pprefix kernel:
    both converge to the sequential kernel's solution as reg -> 0, and at
    tiny reg the two paths must agree to tight tolerance."""
    mesh = Mesh(np.array(jax.devices()[:8]), ("t",))
    B, T, nx, nu = 2, 16, 3, 2
    prob = _rand_problem(jax.random.PRNGKey(7), B, T, nx, nu)
    reg = 1e-10
    ref = batched_lqr_kkt_solve(*prob, reg)
    solve = jax.jit(make_tsharded_lqr_solver(mesh, "t", None, reg=reg))
    out = solve(*prob)
    np.testing.assert_allclose(out.du, ref.du, rtol=1e-6, atol=1e-8)
