"""Rex-quadrotor trajectory optimization via SQP — the hardest
BASELINE.json config (12-state, 4-input, MRP attitude)."""
import jax
import jax.numpy as jnp
import numpy as np

from diff_qp_mpc_tpu.core.types import Bounds, DiagQuadCost
from diff_qp_mpc_tpu.models import RexQuadrotor
from diff_qp_mpc_tpu.solvers import sqp_mpc
from diff_qp_mpc_tpu.solvers.sqp_mpc import SQPConfig


def test_quadrotor_reaches_hover():
    model = RexQuadrotor()
    bsz, T, nx, nu = 4, 20, 12, 4
    n = nx + nu
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(np.concatenate([
        rng.uniform(-1, 1, (bsz, 3)), 0.05 * rng.randn(bsz, 3),
        0.1 * rng.randn(bsz, 3), 0.05 * rng.randn(bsz, 3)], 1), jnp.float64)
    Q = jnp.concatenate([jnp.full((3,), 10.0), jnp.ones((9,))])
    R = jnp.full((4,), 0.1)
    Cd = jnp.broadcast_to(jnp.concatenate([Q, R]), (bsz, T, n)).astype(jnp.float64)
    u_h = model.hover_thrust().astype(jnp.float64)
    xu_goal = jnp.concatenate([jnp.zeros((nx,)), u_h])
    cost = DiagQuadCost(Cd=Cd, c=jnp.broadcast_to(-Cd * xu_goal, (bsz, T, n)))
    bounds = Bounds(u_lo=jnp.zeros((4,)), u_hi=jnp.full((4,), 20.0))
    u0 = jnp.broadcast_to(u_h, (bsz, T, nu)).astype(jnp.float64)

    res = sqp_mpc.solve(model, cost, x0, bounds, u0,
                        cfg=SQPConfig(qp_iter=8), differentiable=False)
    pos0 = float(jnp.linalg.norm(x0[:, :3], axis=1).mean())
    posT = float(jnp.linalg.norm(res.x[:, -1, :3], axis=1).mean())
    # 1-second horizon: expect ≥70% position-error reduction toward hover
    assert posT < 0.3 * pos0, (pos0, posT)
    # dynamically feasible and within bounds
    x_roll = model.rollout(x0, res.u)
    assert float(jnp.abs(res.x - x_roll).max()) < 1e-4
    assert float(res.u.min()) >= -1e-8
    assert float(res.u.max()) <= 20.0 + 1e-8
    assert not bool(jnp.isnan(res.x).any())
