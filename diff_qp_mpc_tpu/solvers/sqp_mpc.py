"""SQP / iLQR-style MPC — rebuild of qpth/qp_wrapper.py MPC.

Outer loop: linearize the dynamics along the current trajectory, solve one
box-constrained trajectory QP in absolute variables (solvers.trajqp — the
Riccati-structured replacement for the reference's dense QP assembly +
DenseQPFunction, qp_wrapper.py:298-345,638-679), take the delta, and accept
via a *rollout* line search: u ← u + αΔu, x ← rollout(x0, u) under the true
nonlinear dynamics with per-batch α decay (qp_wrapper.py:417-436). The
rollout keeps iterates dynamically feasible — this is what lets SQP handle
long-horizon nonlinear problems where penalty methods stall.

Differentiation matches the reference (qp_wrapper.py:397-401): the SQP
iterations run gradient-free; one final QP at the solution carries
gradients through the trajqp custom_vjp (∂ w.r.t. cost C, c and x0; the
linearization point is detached, as in the reference's diff=False
linearize).

TPU restructuring: the SQP loop is a lax.scan with per-batch best-cost
tracking (replaces the host-synced early exit, qp_wrapper.py:365-395); the
line search evaluates all α = decay^j candidates in ONE batched rollout and
picks the largest improving step (same accept/reject semantics as the
reference's sequential decay loop, without host sync).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from diff_qp_mpc_tpu.core.types import Bounds, DiagQuadCost, LinDx, QuadCost
from diff_qp_mpc_tpu.models.base import DynamicsModel
from diff_qp_mpc_tpu.ops import almerit
from diff_qp_mpc_tpu.solvers import trajqp
from diff_qp_mpc_tpu.solvers.trajqp import TrajQPConfig

Array = jnp.ndarray
Cost = Union[QuadCost, DiagQuadCost]
_PREC = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class SQPConfig:
    """Reference defaults: qp_wrapper.py:124-150 (qp_iter, linesearch_decay
    0.2, max_linesearch_iter 10)."""

    qp_iter: int = 10
    ls_decay: float = 0.2
    max_ls: int = 10
    qp: TrajQPConfig = TrajQPConfig()
    single_qp_solve: bool = False  # reference single_qp_ls mode


class SQPResult(NamedTuple):
    x: Array
    u: Array
    cost: Array  # [bsz] final trajectory cost
    alpha: Array  # [bsz] last accepted line-search step
    qp_resid: Array  # [bsz] last QP residual


def _dense_cost(cost: Cost, bsz, T, n) -> QuadCost:
    if isinstance(cost, DiagQuadCost):
        C = jax.vmap(jax.vmap(jnp.diag))(jnp.broadcast_to(cost.Cd, (bsz, T, n)))
        return QuadCost(C=C, c=jnp.broadcast_to(cost.c, (bsz, T, n)))
    return QuadCost(C=jnp.broadcast_to(cost.C, (bsz, T, n, n)),
                    c=jnp.broadcast_to(cost.c, (bsz, T, n)))


def _linearize(dynamics, x, u):
    """(A, B, f) with f the affine offset at the linearization point:
    x_{t+1} ≈ A x_t + B u_t + f_t, f = f(x̄,ū) − A x̄ − B ū
    (reference linearize_dynamics, qp_wrapper.py:481-596, ANALYTIC path)."""
    if isinstance(dynamics, LinDx):
        nx = dynamics.F.shape[-2]
        A = dynamics.F[..., :nx]
        B = dynamics.F[..., nx:]
        return A, B, dynamics.f
    x_next, A, B = dynamics.linearize(x, u)
    f = x_next - jnp.einsum("btij,btj->bti", A, x[:, :-1], precision=_PREC) \
        - jnp.einsum("btij,btj->bti", B, u[:, :-1], precision=_PREC)
    return A, B, f


def _rollout(dynamics, x0, u):
    if isinstance(dynamics, LinDx):
        nx = dynamics.F.shape[-2]

        def roll(xt, inp):
            F_t, f_t, u_t = inp
            xn = jnp.einsum("bij,bj->bi", F_t,
                            jnp.concatenate([xt, u_t], -1), precision=_PREC) + f_t
            return xn, xn

        _, xs = jax.lax.scan(
            roll, x0,
            (jnp.swapaxes(dynamics.F, 0, 1), jnp.swapaxes(dynamics.f, 0, 1),
             jnp.swapaxes(u[:, :-1], 0, 1)),
        )
        return jnp.concatenate([x0[:, None], jnp.swapaxes(xs, 0, 1)], axis=1)
    return dynamics.rollout(x0, u)


def line_search(dynamics, cost: QuadCost, x, u, dx, du, x0, cost_cur,
                decay: float, max_ls: int):
    """All-candidates rollout line search (qp_wrapper.py:417-436 semantics:
    decay per batch until cost improves; here every candidate is evaluated
    in one batched rollout and the largest improving α wins; if none
    improve, the smallest candidate is taken — matching the reference,
    which exits its decay loop holding the last candidate)."""
    bsz, T, nx = x.shape
    alphas = decay ** jnp.arange(max_ls, dtype=x.dtype)  # [L], descending α
    u_cand = u[None] + alphas[:, None, None, None] * du[None]  # [L,bsz,T,nu]
    # vmap over the candidate axis rather than folding it into the batch
    # axis: the (L, bsz) → (L·bsz,) reshape cannot preserve a batch-axis
    # sharding and forces an all-gather per SQP iteration on a sharded mesh
    # (see ops/newton_al.line_search).
    x_cand = jax.vmap(lambda uc: _rollout(dynamics, x0, uc))(u_cand)
    w = jnp.concatenate([x_cand, u_cand], axis=-1)  # [L,bsz,T,nx+nu]
    costs = jax.vmap(lambda wc: almerit.compute_cost(cost, wc))(w)  # [L,bsz]

    improving = costs < cost_cur[None]
    # index of the largest improving α (alphas are descending); if none
    # improve, fall back to the last (smallest α) candidate
    first_improving = jnp.argmax(improving, axis=0)
    any_improving = jnp.any(improving, axis=0)
    idx = jnp.where(any_improving, first_improving, max_ls - 1)
    x_new = jnp.take_along_axis(x_cand, idx[None, :, None, None], axis=0)[0]
    u_new = jnp.take_along_axis(u_cand, idx[None, :, None, None], axis=0)[0]
    cost_new = jnp.take_along_axis(costs, idx[None, :], axis=0)[0]
    return x_new, u_new, alphas[idx], cost_new


def _augment_slew(dynamics, dcost: QuadCost, x0, u_init, x_init,
                  slew: float, prev_ctrl: Optional[Array]):
    """Rewrite the problem over x̃ = [x, u_prev] so the slew penalty
    s·‖u_t − u_{t−1}‖² is a *stage* quadratic (reference SlewRateCost /
    slew_rate_penalty, qp_wrapper.py:30-57,442-457 — which the reference
    itself flags as broken with its line search; state augmentation keeps
    the cost stage-separable so every solver path works unchanged)."""
    from diff_qp_mpc_tpu.models.base import SlewAugmented

    bsz, T, nu = u_init.shape
    nx = x0.shape[-1]
    na = nx + 2 * nu  # [x, u_prev, u]
    xs, us = slice(0, nx), slice(nx + nu, nx + 2 * nu)
    up = slice(nx, nx + nu)
    C = jnp.zeros((bsz, T, na, na), dcost.C.dtype)
    C = C.at[:, :, xs, xs].set(dcost.C[:, :, :nx, :nx])
    C = C.at[:, :, xs, us].set(dcost.C[:, :, :nx, nx:])
    C = C.at[:, :, us, xs].set(dcost.C[:, :, nx:, :nx])
    C = C.at[:, :, us, us].set(dcost.C[:, :, nx:, nx:])
    eye = jnp.eye(nu, dtype=dcost.C.dtype)
    # no penalty at t=0 unless prev_ctrl is known (qp_wrapper.py:457)
    s_t = jnp.full((T,), slew, dcost.C.dtype)
    if prev_ctrl is None:
        s_t = s_t.at[0].set(0.0)
    sb = s_t[None, :, None, None]
    C = C.at[:, :, up, up].add(sb * eye)
    C = C.at[:, :, us, us].add(sb * eye)
    C = C.at[:, :, up, us].add(-sb * eye)
    C = C.at[:, :, us, up].add(-sb * eye)
    c = jnp.zeros((bsz, T, na), dcost.c.dtype)
    c = c.at[:, :, xs].set(dcost.c[:, :, :nx])
    c = c.at[:, :, us].set(dcost.c[:, :, nx:])

    u_prev0 = (jnp.broadcast_to(prev_ctrl, (bsz, nu))
               if prev_ctrl is not None else jnp.zeros((bsz, nu), x0.dtype))
    x0_a = jnp.concatenate([x0, u_prev0], axis=-1)
    x_init_a = None
    if x_init is not None:
        up_hist = jnp.concatenate([u_prev0[:, None], u_init[:, :-1]], axis=1)
        x_init_a = jnp.concatenate([x_init, up_hist], axis=-1)
    return SlewAugmented(dynamics), QuadCost(C=C, c=c), x0_a, x_init_a


def solve(dynamics: Union[DynamicsModel, LinDx], cost: Cost, x0: Array,
          bounds: Bounds, u_init: Array, x_init: Optional[Array] = None,
          cfg: SQPConfig = SQPConfig(), differentiable: bool = True,
          slew_rate_penalty: Optional[float] = None,
          prev_ctrl: Optional[Array] = None,
          x_goal: Optional[Array] = None, goal_weight: float = 1e6
          ) -> SQPResult:
    """Batched SQP MPC solve (qp_wrapper.py MPC.forward → solve_nonlin).

    u_init: [bsz, T, nu] warm start; x_init optional (rolled out if absent).
    Gradients (when ``differentiable``) flow through the final QP w.r.t.
    cost (C, c) and x0.

    ``slew_rate_penalty``/``prev_ctrl``: s·‖u_t − u_{t−1}‖² penalty via
    state augmentation (see _augment_slew; reference qp_wrapper.py:30-57).
    ``x_goal``: terminal goal handled as a stiff terminal penalty
    (goal_weight·‖x_T − g‖², exact as goal_weight→∞) — the structured
    analog of the reference's optional goal equality rows
    (qp_wrapper.py:193-210,641-655), which keeps the KKT system
    block-tridiagonal for the Riccati kernel.
    """
    bsz, T, nu = u_init.shape
    nx = x0.shape[-1]
    n = nx + nu
    dcost = _dense_cost(cost, bsz, T, n)

    if x_goal is not None:
        # applied BEFORE slew augmentation so the terminal penalty rides
        # along in the embedded x-block of the augmented cost
        g = jnp.broadcast_to(jnp.asarray(x_goal, dcost.c.dtype), (bsz, nx))
        eye = goal_weight * jnp.eye(nx, dtype=dcost.C.dtype)
        dcost = QuadCost(
            C=dcost.C.at[:, -1, :nx, :nx].add(eye),
            c=dcost.c.at[:, -1, :nx].add(-goal_weight * g))

    if slew_rate_penalty is not None and not isinstance(dynamics, LinDx):
        dyn_a, dcost_a, x0_a, x_init_a = _augment_slew(
            dynamics, dcost, x0, u_init, x_init, slew_rate_penalty, prev_ctrl)
        res = solve(dyn_a, dcost_a, x0_a, bounds, u_init, x_init_a, cfg,
                    differentiable)
        return SQPResult(x=res.x[..., :nx], u=res.u, cost=res.cost,
                         alpha=res.alpha, qp_resid=res.qp_resid)

    dcost_ng = jax.lax.stop_gradient(dcost)
    x0_ng = jax.lax.stop_gradient(x0)

    # The SQP iteration phase is the reference's torch.no_grad region
    # (qp_wrapper.py:348-401): gradients flow ONLY through the final
    # differentiable QP below. Detaching the warm starts here makes that
    # structural — without it, differentiating w.r.t. a caller-supplied
    # proposal (the DEQ reference) drags reverse-mode AD into the scan'd
    # solver iterations, which the fused Pallas kernel does not define.
    u = jax.lax.stop_gradient(u_init)
    x_init = (jax.lax.stop_gradient(x_init)
              if x_init is not None else None)
    # A caller-supplied x_init (e.g. the DEQ proposal in TrackingMPC's ip
    # path) is warm-start information for the FIRST linearization only.
    # The line-search baseline must be the FEASIBLE shooting trajectory of
    # u_init: tracking references are near-zero-cost by construction, so
    # scoring the (infeasible) proposal itself as the incumbent would
    # reject every feasible rollout candidate and return the proposal
    # untouched with u = u_init — the solve would be a no-op exactly when
    # it is warm-started (the r4 pendulum `--solver_type ip` stall).
    x_feas = _rollout(dynamics, x0_ng, u)
    x = x_init if x_init is not None else x_feas
    cost_cur = almerit.compute_cost(
        dcost_ng, jnp.concatenate([x_feas, u], axis=-1))

    def sqp_iter(carry, _):
        x, u, cost_cur, best_x, best_u, best_cost = carry
        A, B, f = _linearize(dynamics, x, u)
        sol = trajqp.solve(dcost_ng.C, dcost_ng.c, A, B, f, x0_ng, bounds,
                           cfg.qp, x_init=x, u_init=u)
        dx = sol.x - x
        du = sol.u - u
        x, u, alpha, cost_new = line_search(
            dynamics, dcost_ng, x, u, dx, du, x0_ng, cost_cur,
            cfg.ls_decay, cfg.max_ls)
        better = cost_new <= best_cost
        sel = lambda nw, old: jnp.where(better[:, None, None], nw, old)
        best_x = sel(x, best_x)
        best_u = sel(u, best_u)
        best_cost = jnp.minimum(cost_new, best_cost)
        return (x, u, cost_new, best_x, best_u, best_cost), (alpha, sol.resids)

    if cfg.single_qp_solve or cfg.qp_iter == 0:
        # linearize the single QP at the warm start below, but the line
        # search's incumbent/base must be the feasible rollout (see above)
        best_x, best_u = x_feas, u
        lin_x, lin_u = x, u
        alphas_last = jnp.ones((bsz,), x.dtype)
        resid_last = jnp.zeros((bsz,), x.dtype)
    else:
        init = (x, u, cost_cur, x_feas, u, cost_cur)
        (_, _, _, best_x, best_u, _), (alphas, resids) = jax.lax.scan(
            sqp_iter, init, None, length=cfg.qp_iter)
        best_x, best_u = jax.lax.stop_gradient((best_x, best_u))
        lin_x, lin_u = best_x, best_u
        alphas_last, resid_last = alphas[-1], resids[-1]

    # final differentiable QP at the best iterate (qp_wrapper.py:397-401)
    A, B, f = _linearize(dynamics, lin_x, lin_u)
    A, B, f = jax.lax.stop_gradient((A, B, f))
    if differentiable:
        if cfg.qp.kernel == "fused":
            # the fused kernel needs the box as a STATIC python constant
            # (see trajqp.traj_qp_layer_static); a traced bounds here
            # raises TracerArrayConversionError with this context
            import numpy as _np
            bounds_static = Bounds(
                u_lo=tuple(float(v) for v in _np.asarray(bounds.u_lo)),
                u_hi=tuple(float(v) for v in _np.asarray(bounds.u_hi)))
            w_hat = trajqp.traj_qp_layer_static(
                dcost.C, dcost.c, A, B, f, x0, bounds_static, cfg.qp)
        else:
            w_hat = trajqp.traj_qp_layer(
                dcost.C, dcost.c, A, B, f, x0, bounds, cfg.qp)
    else:
        sol = trajqp.solve(dcost.C, dcost.c, A, B, f, x0, bounds, cfg.qp,
                           x_init=best_x, u_init=best_u)
        w_hat = jnp.concatenate([sol.x, sol.u], axis=-1)
    dx = w_hat[..., :nx] - best_x
    du = w_hat[..., nx:] - best_u
    cost_best = almerit.compute_cost(
        dcost_ng, jnp.concatenate([best_x, best_u], axis=-1))
    x_ls, u_ls, alpha, cost_final = jax.lax.stop_gradient(
        line_search(dynamics, dcost_ng, best_x, best_u,
                    jax.lax.stop_gradient(dx), jax.lax.stop_gradient(du),
                    x0_ng, cost_best, cfg.ls_decay, cfg.max_ls))
    # Straight-through: the VALUE is the line search's accepted candidate —
    # u = best_u + α·du with x its FEASIBLE rollout (the reference's line
    # search also scores and returns rollouts, qp_wrapper.py:417-436,598).
    # Returning the rollout rather than the α-blend best_x + α·dx keeps
    # the x output consistent when the final QP was linearized at a
    # caller-supplied proposal (single_qp_solve + x_init: the blend base
    # x_feas and the QP's linearization point differ, so the α-blend was
    # neither a rollout nor the QP plan — advisor r4). The GRADIENT is the
    # full QP implicit sensitivity: at an SQP fixed point dx≈0 makes the
    # line search decay α→~0, which in the reference silently kills the
    # gradient; the IFT gradient through w_hat is correct there.
    w_value = jnp.concatenate([x_ls, u_ls], axis=-1)
    w_out = w_value + (w_hat - jax.lax.stop_gradient(w_hat))
    return SQPResult(x=w_out[..., :nx], u=w_out[..., nx:], cost=cost_final,
                     alpha=alphas_last, qp_resid=resid_last)
