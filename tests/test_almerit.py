"""AL merit gradient / Gauss-Newton Hessian vs autodiff ground truth.

The reference cross-checked its analytic merit Hessian against
torch.func.hessian in commented-out code (qpth/al_utils.py:82-93); here it
is a real test. With linear dynamics the GN Hessian is exact, so both the
gradient and the Hessian blocks must match jax.grad / jax.hessian of the
merit scalar.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diff_qp_mpc_tpu.core.types import Bounds, DiagQuadCost, Lambdas
from diff_qp_mpc_tpu.models import Integrator, Pendulum, step_with_jac
from diff_qp_mpc_tpu.ops import almerit, btsolve


def setup(model, bsz=3, T=5, seed=0):
    nx, nu = model.nx, model.nu
    n = nx + nu
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (bsz, T, nx), jnp.float64)
    u = jax.random.normal(ks[1], (bsz, T, nu), jnp.float64)
    x0 = jax.random.normal(ks[2], (bsz, nx), jnp.float64)
    Cd = jax.random.uniform(ks[3], (bsz, T, n), jnp.float64, 0.5, 2.0)
    c = jax.random.normal(ks[4], (bsz, T, n), jnp.float64)
    cost = DiagQuadCost(Cd=Cd, c=c)
    bounds = Bounds(u_lo=-jnp.ones(nu), u_hi=jnp.ones(nu))
    lam = Lambdas(
        lam_dyn=jax.random.normal(ks[5], (bsz, T - 1, nx), jnp.float64),
        lam_init=jnp.ones((bsz, nx), jnp.float64) * 0.3,
        lam_hi=jnp.abs(jax.random.normal(ks[5], (bsz, T, nu), jnp.float64)),
        lam_lo=jnp.abs(jax.random.normal(ks[0], (bsz, T, nu), jnp.float64)),
    )
    rho = jnp.full((bsz, 1), 2.0, jnp.float64)
    return x, u, x0, cost, bounds, lam, rho


def merit_scalar_fn(model, cost, x0, bounds, lam, rho, b):
    """merit of batch element b as a function of flat xu."""
    nx = model.nx

    def f(xu_flat, T, n):
        xu = xu_flat.reshape(1, T, n)
        res = almerit.residuals(
            model, xu[..., :nx], xu[..., nx:],
            x0[b:b + 1], bounds,
        )
        cost_b = jax.tree.map(lambda a: a[b:b + 1], cost)
        lam_b = jax.tree.map(lambda a: a[b:b + 1], lam)
        return almerit.merit_value(cost_b, res, lam_b, rho[b:b + 1], xu)[0]

    return f


def test_merit_grad_matches_autodiff():
    model = Pendulum()
    x, u, x0, cost, bounds, lam, rho = setup(model)
    bsz, T, nx = x.shape
    n = nx + model.nu
    dyn_jac = step_with_jac(model.step)
    grad, D, O, _ = almerit.merit_grad_hess(cost, dyn_jac, x, u, x0, bounds, lam, rho)

    for b in range(bsz):
        f = merit_scalar_fn(model, cost, x0, bounds, lam, rho, b)
        xu_flat = jnp.concatenate([x[b], u[b]], axis=-1).reshape(-1)
        g_ad = jax.grad(lambda z: f(z, T, n))(xu_flat)
        np.testing.assert_allclose(
            np.asarray(grad[b]).reshape(-1), np.asarray(g_ad), rtol=1e-8, atol=1e-8
        )


def test_gn_hessian_exact_for_linear_dynamics():
    model = Integrator(nx=2, nu=1, dt=0.1)
    x, u, x0, cost, bounds, lam, rho = setup(model, seed=1)
    bsz, T, nx = x.shape
    n = nx + model.nu
    dyn_jac = step_with_jac(model.step)
    _, D, O, _ = almerit.merit_grad_hess(cost, dyn_jac, x, u, x0, bounds, lam, rho)

    for b in range(bsz):
        f = merit_scalar_fn(model, cost, x0, bounds, lam, rho, b)
        xu_flat = jnp.concatenate([x[b], u[b]], axis=-1).reshape(-1)
        H_ad = jax.hessian(lambda z: f(z, T, n))(xu_flat)
        H_blocks = btsolve.to_dense(D[b], O[b])
        np.testing.assert_allclose(
            np.asarray(H_blocks), np.asarray(H_ad), rtol=1e-8, atol=1e-8
        )


def test_lambda_update_clamps_inequalities():
    model = Integrator()
    x, u, x0, cost, bounds, lam, rho = setup(model, seed=2)
    res = almerit.residuals(model, x, u, x0, bounds)
    lam2 = almerit.lambda_update(lam, res, rho)
    assert (np.asarray(lam2.lam_hi) >= 0).all()
    assert (np.asarray(lam2.lam_lo) >= 0).all()
    np.testing.assert_allclose(
        np.asarray(lam2.lam_dyn),
        np.asarray(lam.lam_dyn + rho[:, :, None] * res.r_dyn),
        rtol=1e-12,
    )


def test_residual_layout():
    model = Integrator(nx=2, nu=1, dt=0.1)
    bsz, T = 2, 4
    x = jnp.zeros((bsz, T, 2))
    u = jnp.ones((bsz, T, 1)) * 2.0  # above u_hi=1
    x0 = jnp.ones((bsz, 2))
    bounds = Bounds(u_lo=-jnp.ones(1), u_hi=jnp.ones(1))
    res = almerit.residuals(model, x, u, x0, bounds)
    assert res.r_dyn.shape == (bsz, T - 1, 2)
    np.testing.assert_allclose(np.asarray(res.r_init), -np.ones((bsz, 2)))
    np.testing.assert_allclose(np.asarray(res.r_hi), np.ones((bsz, T, 1)))
    np.testing.assert_allclose(np.asarray(res.r_lo), -3 * np.ones((bsz, T, 1)))
    rc = res.clamped()
    np.testing.assert_allclose(np.asarray(rc.r_lo), np.zeros((bsz, T, 1)))
