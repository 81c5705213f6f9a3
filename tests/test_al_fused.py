"""Fused whole-solver AL kernel vs the scan solver (interpret mode, small
budget — interpret cost scales with the unrolled op count; the full
reference-budget equivalence was verified offline: x err 4e-4 / identical
residual norms at al_iter=2, n_newton=4, n_ls=20)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diff_qp_mpc_tpu as dq
from diff_qp_mpc_tpu.models import Integrator, Pendulum
from diff_qp_mpc_tpu.ops.al_fused_pallas import fused_al_solve
from diff_qp_mpc_tpu.solvers import al_mpc


def _compare(model, B=32, T=3, budget=(1, 2, 4)):
    al_iter, n_newton, n_ls = budget
    nx, nu = model.nx, model.nu
    n = nx + nu
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.uniform(-0.3, 0.3, (B, nx)), jnp.float32)
    Cd = jnp.broadcast_to(
        jnp.asarray([10.0] * nx + [0.01] * nu, jnp.float32), (B, T, n))
    c = jnp.zeros((B, T, n), jnp.float32)
    u_lo = jnp.full((nu,), -3.0, jnp.float32)
    u_hi = jnp.full((nu,), 3.0, jnp.float32)
    u_init = jnp.zeros((B, T, nu), jnp.float32)
    x_init = model.rollout(x0, u_init)

    cfg = al_mpc.ALConfig(al_iter=al_iter, n_newton=n_newton, n_ls=n_ls,
                          rho_max=1e4, reg=1e-5, kernel="scan")
    st = dq.ALState.init(B, T, nx, nu, dtype=jnp.float32)
    x_ref, u_ref, _, stats = al_mpc.solve(
        model, dq.DiagQuadCost(Cd=Cd, c=c), x0,
        dq.Bounds(u_lo=u_lo, u_hi=u_hi), st, cfg)

    w, lamd, lamh, laml, res = fused_al_solve(
        model, Cd, c, x0, u_lo, u_hi, x_init, u_init,
        al_iter=al_iter, n_newton=n_newton, n_ls=n_ls,
        rho_max=1e4, reg=1e-5, interpret=True)

    np.testing.assert_allclose(np.asarray(w[..., :nx]), np.asarray(x_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(w[..., nx:]), np.asarray(u_ref),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(float(res.mean()),
                               float(stats.dyn_res.mean()), rtol=1e-3)


def test_fused_matches_scan_pendulum():
    _compare(Pendulum())


def test_fused_matches_scan_integrator():
    _compare(Integrator(nx=2, nu=1, dt=0.1))


def test_fused_matches_scan_cartpole_cossin():
    from diff_qp_mpc_tpu.models import CartpoleCosSin

    _compare(CartpoleCosSin())


def test_quadrotor_step_parts_matches_array_path():
    from diff_qp_mpc_tpu.models import RexQuadrotor

    m = RexQuadrotor()
    rng = np.random.RandomState(0)
    x = jnp.asarray(0.3 * rng.randn(7, 12), jnp.float32)
    u = jnp.asarray(np.abs(rng.randn(7, 4)) * 2, jnp.float32)
    ref = m(x, u)
    parts = m.step_parts(tuple(x[:, i] for i in range(12)),
                         tuple(u[:, i] for i in range(4)))
    np.testing.assert_allclose(np.asarray(jnp.stack(parts, -1)),
                               np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not os.environ.get("RUN_SLOW_TESTS"),
                    reason="quadrotor fused interpret run takes minutes "
                           "(RK4 ODE through 16 jvps in interpreter mode); "
                           "set RUN_SLOW_TESTS=1 to include")
def test_fused_matches_scan_quadrotor():
    """12-state MRP quadrotor through the whole-solver fused kernel.
    (f64: under the x64 conftest the model's inertia constants are f64,
    so everything runs in f64 here — interpret mode handles it.)
    Verified passing at al_iter=1/n_newton=2/n_ls=4 (7.5 min)."""
    from diff_qp_mpc_tpu.models import RexQuadrotor

    model = RexQuadrotor()
    B, T, nx, nu = 8, 3, 12, 4
    n = nx + nu
    dt_ = jnp.float64
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(np.concatenate([
        rng.uniform(-0.5, 0.5, (B, 3)), 0.05 * rng.randn(B, 3),
        0.1 * rng.randn(B, 3), 0.05 * rng.randn(B, 3)], 1), dt_)
    Cd = jnp.broadcast_to(jnp.asarray(
        [10.0] * 3 + [1.0] * 9 + [0.1] * 4, dt_), (B, T, n))
    u_h = model.hover_thrust().astype(dt_)
    xu_goal = jnp.concatenate([jnp.zeros((nx,), dt_), u_h])
    c = jnp.broadcast_to(-Cd * xu_goal, (B, T, n))
    u_lo = jnp.zeros((nu,), dt_)
    u_hi = jnp.full((nu,), 20.0, dt_)
    u_init = jnp.broadcast_to(u_h, (B, T, nu)).astype(dt_)
    x_init = model.rollout(x0, u_init)

    cfg = al_mpc.ALConfig(al_iter=1, n_newton=1, n_ls=2, rho_max=1e4,
                          reg=1e-5, kernel="scan")
    st = dq.ALState.init(B, T, nx, nu, dtype=dt_)
    x_ref, u_ref, _, stats = al_mpc.solve(
        model, dq.DiagQuadCost(Cd=Cd, c=c), x0,
        dq.Bounds(u_lo=u_lo, u_hi=u_hi), st, cfg, u_init=u_init)

    w, lamd, lamh, laml, res = fused_al_solve(
        model, Cd, c, x0, u_lo, u_hi, x_init, u_init,
        al_iter=1, n_newton=1, n_ls=2, rho_max=1e4, reg=1e-5,
        interpret=True)
    np.testing.assert_allclose(np.asarray(w[..., :nx]), np.asarray(x_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(w[..., nx:]), np.asarray(u_ref),
                               rtol=2e-3, atol=3e-3)
