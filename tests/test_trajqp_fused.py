"""Fused trajectory-QP IPM kernel vs the scan solver (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from diff_qp_mpc_tpu.core.types import Bounds
from diff_qp_mpc_tpu.solvers import trajqp
from diff_qp_mpc_tpu.solvers.trajqp import TrajQPConfig


def random_traj_qp(B=16, T=5, nx=3, nu=2, seed=0, dtype=jnp.float32):
    n = nx + nu
    rng = np.random.RandomState(seed)
    M = rng.randn(B, T, n, n)
    C = jnp.asarray(0.1 * M @ M.transpose(0, 1, 3, 2) + np.eye(n), dtype)
    c = jnp.asarray(0.3 * rng.randn(B, T, n), dtype)
    A = jnp.asarray(np.eye(nx) + 0.1 * rng.randn(B, T - 1, nx, nx), dtype)
    Bm = jnp.asarray(0.3 * rng.randn(B, T - 1, nx, nu), dtype)
    f = jnp.asarray(0.1 * rng.randn(B, T - 1, nx), dtype)
    x0 = jnp.asarray(0.5 * rng.randn(B, nx), dtype)
    bounds = Bounds(u_lo=jnp.full((nu,), -1.5, dtype),
                    u_hi=jnp.full((nu,), 1.5, dtype))
    return C, c, A, Bm, f, x0, bounds


def test_fused_matches_scan():
    C, c, A, Bm, f, x0, bounds = random_traj_qp()
    ref = trajqp.solve(C, c, A, Bm, f, x0, bounds,
                       TrajQPConfig(max_iter=8, reg=1e-7, kernel="scan"))
    fus = trajqp.solve(C, c, A, Bm, f, x0, bounds,
                       TrajQPConfig(max_iter=8, reg=1e-7, kernel="fused",
                                    interpret=True))
    np.testing.assert_allclose(np.asarray(fus.u), np.asarray(ref.u),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(fus.x), np.asarray(ref.x),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(fus.resids),
                               np.asarray(ref.resids), rtol=5e-2, atol=1e-3)
    # bounds respected
    assert float(jnp.abs(fus.u).max()) <= 1.5 + 1e-4


def test_fused_with_warm_start():
    C, c, A, Bm, f, x0, bounds = random_traj_qp(seed=3)
    B, Tm1 = A.shape[0], A.shape[1]
    T, nx, nu = Tm1 + 1, A.shape[2], Bm.shape[3]
    rng = np.random.RandomState(4)
    x_init = jnp.asarray(0.3 * rng.randn(B, T, nx), jnp.float32)
    u_init = jnp.asarray(0.3 * rng.randn(B, T, nu), jnp.float32)
    ref = trajqp.solve(C, c, A, Bm, f, x0, bounds,
                       TrajQPConfig(max_iter=8, reg=1e-7, kernel="scan"),
                       x_init=x_init, u_init=u_init)
    fus = trajqp.solve(C, c, A, Bm, f, x0, bounds,
                       TrajQPConfig(max_iter=8, reg=1e-7, kernel="fused",
                                    interpret=True),
                       x_init=x_init, u_init=u_init)
    np.testing.assert_allclose(np.asarray(fus.u), np.asarray(ref.u),
                               rtol=2e-3, atol=2e-3)
