"""SL1QP MPC: elastic QPs agree with hard-constrained SQP when feasible,
slacks absorb infeasibility otherwise."""
import jax
import jax.numpy as jnp
import numpy as np

from diff_qp_mpc_tpu.core.types import Bounds, DiagQuadCost
from diff_qp_mpc_tpu.models import Integrator
from diff_qp_mpc_tpu.solvers import sl1qp_mpc, sqp_mpc
from diff_qp_mpc_tpu.solvers.sl1qp_mpc import SL1QPConfig
from diff_qp_mpc_tpu.solvers.sqp_mpc import SQPConfig


def setup(bsz=3, T=5):
    model = Integrator(nx=2, nu=1, dt=0.1)
    nx, nu = 2, 1
    n = nx + nu
    x0 = jax.random.normal(jax.random.PRNGKey(0), (bsz, nx), jnp.float64)
    Cd = jnp.concatenate(
        [jnp.full((bsz, T, nx), 10.0), jnp.full((bsz, T, nu), 0.01)], -1
    ).astype(jnp.float64)
    cost = DiagQuadCost(Cd=Cd, c=jnp.zeros((bsz, T, n), jnp.float64))
    bounds = Bounds(u_lo=jnp.array([-3.0]), u_hi=jnp.array([3.0]))
    u0 = jnp.zeros((bsz, T, nu), jnp.float64)
    return model, cost, x0, bounds, u0


def test_matches_hard_sqp_when_feasible():
    model, cost, x0, bounds, u0 = setup()
    # big mu → slacks driven to ~0 → same solution as hard constraints
    res_el = sl1qp_mpc.solve(model, cost, x0, bounds, u0,
                             cfg=SL1QPConfig(qp_iter=4, mu=100.0))
    res_hd = sqp_mpc.solve(model, cost, x0, bounds, u0,
                           cfg=SQPConfig(qp_iter=4), differentiable=False)
    assert float(res_el.slack_l1.max()) < 1e-3
    np.testing.assert_allclose(np.asarray(res_el.u), np.asarray(res_hd.u),
                               rtol=1e-2, atol=1e-3)


def test_feasible_rollout_and_bounds():
    model, cost, x0, bounds, u0 = setup()
    res = sl1qp_mpc.solve(model, cost, x0, bounds, u0,
                          cfg=SL1QPConfig(qp_iter=4, mu=50.0))
    # line search keeps iterates on the rollout manifold
    x_roll = model.rollout(x0, res.u)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_roll),
                               rtol=1e-8, atol=1e-8)
    assert float(jnp.abs(res.u).max()) <= 3.0 + 1e-6


def test_riccati_backend_matches_dense():
    """Structured elastic path (trajqp.solve_elastic via the elastic
    Riccati recursion) vs the reference-style dense expanded QP."""
    model, cost, x0, bounds, u0 = setup()
    res_r = sl1qp_mpc.solve(model, cost, x0, bounds, u0,
                            cfg=SL1QPConfig(qp_iter=4, mu=100.0,
                                            backend="riccati"))
    res_d = sl1qp_mpc.solve(model, cost, x0, bounds, u0,
                            cfg=SL1QPConfig(qp_iter=4, mu=100.0,
                                            backend="dense"))
    np.testing.assert_allclose(np.asarray(res_r.u), np.asarray(res_d.u),
                               rtol=1e-2, atol=1e-3)
    assert float(res_r.slack_l1.max()) < 1e-3
