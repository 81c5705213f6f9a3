"""Independent trajectory-optimizer cross-check (the ALTRO role).

The reference validates its generated 2-link cartpole dynamics and
solutions against an independent Julia ALTRO solve driving the same C code
(my_envs/cartpole2l/src/test_trajopt_altro.jl:19-41). Equivalent here: a
direct-collocation NLP solved by scipy SLSQP — decision variables
(x_{0..T-1}, u_{0..T-1}), dynamics-defect equality constraints, box bounds
on u — must agree with solvers.sqp_mpc on the same Cartpole2L problem.
SLSQP shares no code with the SQP/Riccati stack (different NLP method,
dense BFGS QPs), so agreement validates dynamics AND solver together.
"""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from diff_qp_mpc_tpu.core.types import Bounds, DiagQuadCost
from diff_qp_mpc_tpu.models import Cartpole2L, Cartpole1L
from diff_qp_mpc_tpu.solvers import sqp_mpc
from diff_qp_mpc_tpu.solvers.sqp_mpc import SQPConfig


def collocation_solve(model, x0, Cd, T, u_lo, u_hi):
    """Direct collocation via SLSQP: min Σ ½wᵀdiag(Cd)w s.t. defects = 0."""
    nx, nu = model.nx, model.nu
    n = nx + nu
    step = jax.jit(lambda x, u: model.step(x, u))

    def unpack(z):
        w = z.reshape(T, n)
        return w[:, :nx], w[:, nx:]

    def obj(z):
        return float(0.5 * np.sum(Cd * z.reshape(T, n) ** 2))

    def obj_grad(z):
        return (Cd * z.reshape(T, n)).reshape(-1)

    def defects(z):
        xs, us = unpack(z)
        out = [np.asarray(xs[0] - x0)]
        for t in range(T - 1):
            out.append(np.asarray(
                step(jnp.asarray(xs[t]), jnp.asarray(us[t])) - xs[t + 1]))
        return np.concatenate(out)

    z0 = np.zeros(T * n)
    z0.reshape(T, n)[:, :nx] = np.asarray(x0)
    bounds = [(None, None)] * nx + [(u_lo, u_hi)] * nu
    res = minimize(obj, z0, jac=obj_grad, method="SLSQP",
                   bounds=bounds * T,
                   constraints={"type": "eq", "fun": defects},
                   options={"maxiter": 300, "ftol": 1e-12})
    assert res.success, res.message
    return unpack(res.x)


def _crosscheck(model, x0_np, u_max, T=8, rtol=2e-3, atol=2e-3):
    nx, nu = model.nx, model.nu
    n = nx + nu
    Cd_row = np.concatenate([np.full(nx, 1.0), np.full(nu, 0.01)])
    x0 = jnp.asarray(x0_np)[None]
    Cd = jnp.broadcast_to(jnp.asarray(Cd_row), (1, T, n))
    cost = DiagQuadCost(Cd=Cd, c=jnp.zeros((1, T, n)))
    bounds = Bounds(u_lo=jnp.full((nu,), -u_max), u_hi=jnp.full((nu,), u_max))
    res = sqp_mpc.solve(model, cost, x0, bounds,
                        jnp.zeros((1, T, nu)), cfg=SQPConfig(qp_iter=12),
                        differentiable=False)
    xs_ref, us_ref = collocation_solve(
        model, x0_np, np.broadcast_to(Cd_row, (T, n)), T, -u_max, u_max)
    np.testing.assert_allclose(np.asarray(res.u[0]), us_ref,
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(res.x[0]), xs_ref,
                               rtol=rtol, atol=atol)


def test_cartpole2l_matches_independent_collocation():
    """2-link cartpole regulation near the hanging equilibrium: the SQP
    trajectory must match the independent SLSQP collocation NLP (the
    test_trajopt_altro.jl role)."""
    model = Cartpole2L(dt=0.05)
    x0 = np.array([0.3, 0.2, -0.15, 0.0, 0.0, 0.0])
    _crosscheck(model, x0, u_max=250.0)


def test_cartpole1l_matches_independent_collocation():
    model = Cartpole1L(dt=0.05, max_force=100.0)
    x0 = np.array([0.4, 0.3, 0.0, -0.2])
    _crosscheck(model, x0, u_max=100.0)
