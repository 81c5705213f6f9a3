"""SL1QP MPC — elastic-slack (l1-penalty) SQP, rebuild of qpth/sl1qp_mpc.py.

Same SQP skeleton as solvers.sqp_mpc but every trajectory QP is expanded
with elastic slacks so it is always feasible (sl1qp_mpc.py:703-752
sl1qpify):

    min ½zᵀQz + qᵀz + μ·Σ(v + w) + μ·Σt
    s.t. Az − b = v − w,  Gz − h ≤ t,  v, w, t ≥ 0

Two backends:
- "riccati" (default, TPU-native): the elastic pairs eliminate per IPM
  iteration into a diagonal relaxation Θ of the dynamics rows, solved by
  the elastic Riccati recursion (trajqp.solve_elastic / ops.riccati theta
  support) in O(T) — the structure the dense expansion destroys.
- "dense": the reference-style expanded QP via the batched PDIPM
  (capability parity path; validates the structured backend).

Note: the reference sizes the v/w blocks with `nineq` where `neq` is meant
(sl1qp_mpc.py:735-739 works only because its trajectory QPs happen to have
compatible sizes); the assembly here uses the correct dimensions.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from diff_qp_mpc_tpu.core.types import Bounds, DiagQuadCost, LinDx, QuadCost
from diff_qp_mpc_tpu.models.base import DynamicsModel
from diff_qp_mpc_tpu.ops import almerit
from diff_qp_mpc_tpu.solvers import qp as qp_layer_mod
from diff_qp_mpc_tpu.solvers import sqp_mpc
from diff_qp_mpc_tpu.solvers.qp import QPConfig

Array = jnp.ndarray
Cost = Union[QuadCost, DiagQuadCost]
_PREC = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class SL1QPConfig:
    qp_iter: int = 10
    mu: float = 10.0  # l1 penalty weight (reference self.mu)
    ls_decay: float = 0.2
    max_ls: int = 10
    qp: QPConfig = QPConfig(max_iter=20)
    # "dense": reference-style expanded QP via the batched PDIPM;
    # "riccati": structured elastic IPM (trajqp.solve_elastic — O(T) via
    # the elastic Riccati recursion; the TPU-native path)
    backend: str = "riccati"


class SL1QPResult(NamedTuple):
    x: Array
    u: Array
    cost: Array
    slack_l1: Array  # [bsz] Σ(v+w+t) at the last QP — constraint violation proxy


def _assemble_traj_qp(C, c, A, B, f, x0, bounds):
    """Flatten the trajectory QP to dense (Q, q, G, h, Aeq, beq)
    (reference compute_Qq/Ab/Gh_dense, qp_wrapper.py:638-679)."""
    bsz, Tm1, nx, nu = B.shape
    T = Tm1 + 1
    n = nx + nu
    nw = T * n
    dt = C.dtype

    # block-diagonal Q and stacked q
    Q = jnp.zeros((bsz, nw, nw), dt)
    for t in range(T):
        Q = Q.at[:, t * n:(t + 1) * n, t * n:(t + 1) * n].set(C[:, t])
    q = c.reshape(bsz, nw)

    neq = T * nx
    Aeq = jnp.zeros((bsz, neq, nw), dt)
    beq = jnp.zeros((bsz, neq), dt)
    eye_x = jnp.eye(nx, dtype=dt)
    for t in range(Tm1):
        r = slice(t * nx, (t + 1) * nx)
        Aeq = Aeq.at[:, r, t * n:t * n + nx].set(-A[:, t])
        Aeq = Aeq.at[:, r, t * n + nx:(t + 1) * n].set(-B[:, t])
        Aeq = Aeq.at[:, r, (t + 1) * n:(t + 1) * n + nx].set(eye_x)
        beq = beq.at[:, r].set(f[:, t])
    Aeq = Aeq.at[:, Tm1 * nx:, :nx].set(eye_x)
    beq = beq.at[:, Tm1 * nx:].set(x0)

    nineq = 2 * T * nu
    G = jnp.zeros((bsz, nineq, nw), dt)
    h = jnp.zeros((bsz, nineq), dt)
    u_hi = jnp.broadcast_to(bounds.u_hi, (bsz, T, nu)).astype(dt)
    u_lo = jnp.broadcast_to(bounds.u_lo, (bsz, T, nu)).astype(dt)
    for t in range(T):
        for j in range(nu):
            G = G.at[:, 2 * (t * nu + j), t * n + nx + j].set(1.0)
            h = h.at[:, 2 * (t * nu + j)].set(u_hi[:, t, j])
            G = G.at[:, 2 * (t * nu + j) + 1, t * n + nx + j].set(-1.0)
            h = h.at[:, 2 * (t * nu + j) + 1].set(-u_lo[:, t, j])
    return Q, q, G, h, Aeq, beq


def sl1qpify(Q, q, G, h, A, mu: float):
    """Expand with elastic slacks [z, v, w, t] (sl1qp_mpc.py:703-752,
    dimension-corrected). Returns the expanded (Q, q, G, h, A, b)."""
    bsz, neq, nz = A.shape
    nineq = G.shape[1]
    dt = Q.dtype
    Ie = jnp.broadcast_to(jnp.eye(neq, dtype=dt), (bsz, neq, neq))
    Ii = jnp.broadcast_to(jnp.eye(nineq, dtype=dt), (bsz, nineq, nineq))
    Z = lambda r, c_: jnp.zeros((bsz, r, c_), dt)

    # A [z, v, w, t]: Az − v + w = b
    A2 = jnp.concatenate([A, -Ie, Ie, Z(neq, nineq)], axis=2)
    # G rows: Gz − t ≤ h; −v ≤ 0; −w ≤ 0; −t ≤ 0
    G2 = jnp.concatenate([
        jnp.concatenate([G, Z(nineq, neq), Z(nineq, neq), -Ii], axis=2),
        jnp.concatenate([Z(neq, nz), -Ie, Z(neq, neq), Z(neq, nineq)], axis=2),
        jnp.concatenate([Z(neq, nz), Z(neq, neq), -Ie, Z(neq, nineq)], axis=2),
        jnp.concatenate([Z(nineq, nz), Z(nineq, neq), Z(nineq, neq), -Ii], axis=2),
    ], axis=1)
    h2 = jnp.concatenate([h, jnp.zeros((bsz, 2 * neq + nineq), dt)], axis=1)
    n_slack = 2 * neq + nineq
    # tiny quadratic on slacks keeps Q ≻ 0 for the PDIPM
    Q2 = jnp.zeros((bsz, nz + n_slack, nz + n_slack), dt)
    Q2 = Q2.at[:, :nz, :nz].set(Q)
    diag_idx = jnp.arange(nz, nz + n_slack)
    Q2 = Q2.at[:, diag_idx, diag_idx].set(1e-6)
    q2 = jnp.concatenate([q, jnp.full((bsz, n_slack), mu, dt)], axis=1)
    return Q2, q2, G2, h2, A2


def solve(dynamics: Union[DynamicsModel, LinDx], cost: Cost, x0: Array,
          bounds: Bounds, u_init: Array, x_init: Optional[Array] = None,
          cfg: SL1QPConfig = SL1QPConfig(), differentiable: bool = True
          ) -> SL1QPResult:
    """Batched SL1QP MPC solve (sl1qp_mpc.py MPC.forward → solve_nonlin).

    Differentiation matches the reference (sl1qp_mpc.py:301-331: the final
    elastic QP carries gradients via QPFunction.backward): the SQP
    iterations run gradient-free; one final elastic QP at the best iterate
    carries gradients w.r.t. cost (C, c) and x0 through the
    elastic_traj_qp_layer custom_vjp, with the same straight-through
    value/gradient split as solvers.sqp_mpc.
    """
    from diff_qp_mpc_tpu.solvers import trajqp

    bsz, T, nu = u_init.shape
    nx = x0.shape[-1]
    n = nx + nu
    dcost = sqp_mpc._dense_cost(cost, bsz, T, n)
    dcost_ng = jax.lax.stop_gradient(dcost)
    x0_ng = jax.lax.stop_gradient(x0)
    tq_cfg = trajqp.TrajQPConfig(max_iter=cfg.qp.max_iter)

    u = u_init
    x = x_init if x_init is not None else sqp_mpc._rollout(dynamics, x0_ng, u)
    cost_cur = almerit.compute_cost(dcost_ng, jnp.concatenate([x, u], -1))
    nw = T * n

    def one_qp(x, u):
        A, B, f = sqp_mpc._linearize(dynamics, x, u)
        if cfg.backend == "riccati":
            sol = trajqp.solve_elastic(
                dcost_ng.C, dcost_ng.c, A, B, f, x0_ng, bounds, cfg.mu,
                cfg=tq_cfg, x_init=x, u_init=u)
            return sol.x, sol.u, sol.slack_l1
        Qd, qd, Gd, hd, Aeq, beq = _assemble_traj_qp(
            dcost_ng.C, dcost_ng.c, A, B, f, x0_ng, bounds)
        Q2, q2, G2, h2, A2 = sl1qpify(Qd, qd, Gd, hd, Aeq, cfg.mu)
        sol = qp_layer_mod.qp_solve(Q2, q2, G2, h2, A2, beq, cfg.qp)
        w = sol.z[:, :nw].reshape(bsz, T, n)
        slack = jnp.sum(sol.z[:, nw:], axis=1)
        return w[..., :nx], w[..., nx:], slack

    def sqp_iter(carry, _):
        x, u, cost_cur, best_x, best_u, best_cost, _ = carry
        x_hat, u_hat, slack = one_qp(x, u)
        x, u, alpha, cost_new = sqp_mpc.line_search(
            dynamics, dcost_ng, x, u, x_hat - x, u_hat - u, x0_ng, cost_cur,
            cfg.ls_decay, cfg.max_ls)
        better = cost_new <= best_cost
        sel = lambda nw_, old: jnp.where(better[:, None, None], nw_, old)
        return (x, u, cost_new, sel(x, best_x), sel(u, best_u),
                jnp.minimum(cost_new, best_cost), slack), None

    init = (x, u, cost_cur, x, u, cost_cur, jnp.zeros((bsz,), x.dtype))
    (x, u, cost_cur, best_x, best_u, best_cost, slack), _ = jax.lax.scan(
        sqp_iter, init, None, length=cfg.qp_iter)
    best_x, best_u = jax.lax.stop_gradient((best_x, best_u))

    if not differentiable:
        return SL1QPResult(x=best_x, u=best_u, cost=best_cost, slack_l1=slack)

    # final differentiable elastic QP at the best iterate
    # (sl1qp_mpc.py:301-331 single_qp outside no_grad)
    A, B, f = jax.lax.stop_gradient(
        sqp_mpc._linearize(dynamics, best_x, best_u))
    w_hat = trajqp.elastic_traj_qp_layer(
        dcost.C, dcost.c, A, B, f, x0, bounds, cfg.mu, tq_cfg,
        best_x, best_u)
    dx = w_hat[..., :nx] - best_x
    du = w_hat[..., nx:] - best_u
    cost_best = almerit.compute_cost(
        dcost_ng, jnp.concatenate([best_x, best_u], axis=-1))
    x_ls, u_ls, alpha, cost_final = jax.lax.stop_gradient(
        sqp_mpc.line_search(dynamics, dcost_ng, best_x, best_u,
                            jax.lax.stop_gradient(dx),
                            jax.lax.stop_gradient(du),
                            x0_ng, cost_best, cfg.ls_decay, cfg.max_ls))
    # straight-through: the VALUE is the line-search-accepted rollout point
    # (stays on the dynamics manifold, reference sl1qp_mpc single_qp +
    # line_search), the GRADIENT is the elastic QP's implicit sensitivity
    w_value = jnp.concatenate([x_ls, u_ls], axis=-1)
    w_out = w_value + (w_hat - jax.lax.stop_gradient(w_hat))
    return SL1QPResult(x=w_out[..., :nx], u=w_out[..., nx:],
                       cost=cost_final, slack_l1=slack)
