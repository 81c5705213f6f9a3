"""DEQ-MPC policies: equilibrium network interleaved with differentiable MPC.

Rebuild of deqmpc/policies.py DEQMPCPolicy/Tracking_MPC/NNMPCPolicy:
the DEQ cell proposes a reference trajectory, the tracking MPC projects it
onto the dynamics manifold (AL solve with implicit gradients), and the
(detached) solution feeds the next equilibrium iteration
(policies.py:444-529). All solver warm-start state is explicit and
reinitialized per forward, as the reference does in training
(policies.py:463-464 reinitialize).
"""
from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diff_qp_mpc_tpu.core.types import ALState, Bounds, DiagQuadCost, QuadCost
from diff_qp_mpc_tpu.learning.deq import DEQLayer
from diff_qp_mpc_tpu.models.base import DynamicsModel
from diff_qp_mpc_tpu.solvers import al_mpc, sqp_mpc

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TrackingMPC:
    """Diagonal-cost tracking MPC wrapper (policies.py:567-687).

    Builds Cd = diag(Q, R) and p = −Cd·τ_ref (policies.py:669-680) and
    solves the box-constrained MPC with the selected backend. Stateless;
    AL warm-start state is passed explicitly.

    ``solver_type`` mirrors the reference's Tracking_MPC dispatch
    (policies.py:605-662): "al" → AL_mpc.MPC (the DEQ-MPC training
    default), "ip" → the interior-point SQP solver (qp_wrapper.MPC via
    ip_mpc, i.e. our solvers.sqp_mpc), both differentiable.
    """

    model: DynamicsModel
    T: int
    Q: Tuple[float, ...]  # per-state weights (len nx)
    R: Tuple[float, ...]  # per-control weights (len nu)
    u_lo: Tuple[float, ...]
    u_hi: Tuple[float, ...]
    cfg: al_mpc.ALConfig = al_mpc.ALConfig()
    solver_type: str = "al"  # "al" | "ip"
    sqp_cfg: sqp_mpc.SQPConfig = sqp_mpc.SQPConfig(qp_iter=2)
    # route solves through the fused whole-solver Pallas kernel
    # (ops/al_fused_pallas)
    use_fused: bool = False
    # Warm-start-state carry across successive solves (λ/ρ/history in
    # ALState). None = legacy inference (scan carried, fused fresh — the
    # pre-round-3 per-path defaults, kept so old checkpoints reproduce
    # their training operator). Explicit True/False applies to BOTH
    # kernels, making the solver path a pure performance choice: a
    # checkpoint trained on either path evals identically on the other
    # (fused carry uses al_mpc.solve_fused_stateful; scan fresh passes a
    # reinitialized ALState per solve).
    carry_state: bool = None
    # Dense terminal value-function cost P (row-major tuple-of-tuples so
    # the frozen dataclass stays hashable as a flax-module attribute):
    # adds x_Tᵀ P x_T about the terminal reference. The infinite-horizon
    # LQR tail (solvers/lqr.terminal_value_cost) makes short-horizon MPC
    # stabilizing — the corrected 2-link cartpole is unstabilizable at
    # ANY probed budget (up to T=60/qp_iter=10, f32 or f64) without it
    # and holds 64/64 at T=5 with it. ip-solver path only: the AL fused
    # kernel's cost is diagonal by construction, while the trajectory-QP
    # kernels carry dense per-stage blocks natively.
    terminal_P: Optional[Tuple[Tuple[float, ...], ...]] = None

    @property
    def carry(self) -> bool:
        if self.carry_state is None:
            return not self.use_fused
        return self.carry_state

    def bounds(self, dtype=jnp.float32) -> Bounds:
        return Bounds(u_lo=jnp.asarray(self.u_lo, dtype),
                      u_hi=jnp.asarray(self.u_hi, dtype))

    def cost(self, xu_ref: Array) -> DiagQuadCost:
        bsz, T, n = xu_ref.shape
        Cd = jnp.broadcast_to(
            jnp.asarray(self.Q + self.R, xu_ref.dtype), (bsz, T, n))
        return DiagQuadCost(Cd=Cd, c=-Cd * xu_ref)

    def cost_with_terminal(self, xu_ref: Array) -> QuadCost:
        """Dense tracking cost with the terminal P added to the last
        stage's state block; c keeps the same reference-centering
        semantics (−C·τ_ref) so the minimum of every stage quadratic is
        still the reference."""
        bsz, T, n = xu_ref.shape
        nx = self.model.nx
        Cd = jnp.broadcast_to(
            jnp.asarray(self.Q + self.R, xu_ref.dtype), (bsz, T, n))
        C = jax.vmap(jax.vmap(jnp.diag))(Cd)
        P = jnp.asarray(self.terminal_P, xu_ref.dtype)
        C = C.at[:, -1, :nx, :nx].add(P)
        return QuadCost(C=C, c=-jnp.einsum("btij,btj->bti", C, xu_ref))

    def init_state(self, bsz: int, dtype=jnp.float32) -> ALState:
        nx, nu = self.model.nx, self.model.nu
        return ALState.init(bsz, self.T, nx, nu,
                            hist_len=self.cfg.al_iter + 1, dtype=dtype)

    def solve(self, x0: Array, x_ref: Array, u_ref: Array, state: ALState,
              x_init: Optional[Array] = None, u_init: Optional[Array] = None):
        xu_ref = jnp.concatenate([x_ref, u_ref], axis=-1)
        if self.terminal_P is not None and self.solver_type != "ip":
            raise NotImplementedError(
                "terminal_P needs the dense-cost ip (trajectory-QP) path;"
                " the AL kernels' cost is diagonal by construction")
        cost = (self.cost_with_terminal(xu_ref)
                if self.terminal_P is not None else self.cost(xu_ref))
        if self.solver_type == "ip":
            # the fused trajectory-QP kernel bakes the box bounds as
            # compile-time clip constants (trajqp.solve converts them with
            # np.asarray), so it must receive the STATIC python tuples —
            # a device array here is a tracer under the jitted train step
            # and crashed `--solver_type ip --fused` at the
            # pretrain→deqmpc transition every run up to r5 (the r4
            # "healthy at 900 steps" ip_fused run actually died of this
            # at iter 1000)
            ip_bounds = (Bounds(u_lo=self.u_lo, u_hi=self.u_hi)
                         if self.sqp_cfg.qp.kernel == "fused"
                         else self.bounds(x0.dtype))
            res = sqp_mpc.solve(
                self.model, cost, x0, ip_bounds,
                u_init=u_init if u_init is not None else u_ref,
                x_init=x_init, cfg=self.sqp_cfg, differentiable=True)
            return res.x, res.u, state, res.qp_resid
        if self.use_fused:
            # pass the STATIC python-tuple bounds (the fused kernels need
            # compile-time constants; jnp arrays become tracers here)
            if self.carry:
                x, u, new_state, stats = al_mpc.solve_fused_stateful(
                    self.model, cost, x0,
                    Bounds(u_lo=self.u_lo, u_hi=self.u_hi), state, self.cfg,
                    x_init=x_init, u_init=u_init)
                return x, u, new_state, stats
            x, u, res = al_mpc.solve_fused(
                self.model, cost, x0,
                Bounds(u_lo=self.u_lo, u_hi=self.u_hi), self.cfg,
                x_init=x_init, u_init=u_init)
            return x, u, state, res
        if not self.carry:
            # fresh-state scan solve: reproduces the fused fresh-λ operator
            # exactly (explicit x/u inits, reinitialized λ/ρ per call)
            state = self.init_state(x0.shape[0], x0.dtype)
        x, u, new_state, stats = al_mpc.solve(
            self.model, cost, x0, self.bounds(x0.dtype), state, self.cfg,
            x_init=x_init, u_init=u_init)
        return x, u, new_state, stats


class DEQMPCRollout(NamedTuple):
    """One DEQ-MPC iterate (reference trajs entries, policies.py:515)."""

    net_states: Array  # [bsz, T, nx] network proposal
    states: Array  # [bsz, T, nx] MPC-projected states
    actions: Array  # [bsz, T, nu] MPC actions


class DEQMPCPolicy(nn.Module):
    """policies.py:426-529. __call__(x, qp_solve, lastqp_solve) returns
    (iterates, dyn_res): ``iterates`` stacks every DEQ-MPC iteration
    (all are supervised by the loss), dyn_res is the mean dynamics
    residual of the final reference (diagnostic, policies.py:521)."""

    nx: int
    nu: int
    nq: int
    T: int
    hdim: int
    dt: float
    tracking: TrackingMPC
    deq_iter: int = 6
    out_type: int = 2  # DEQ layer output type (state estimate + prediction)
    layer_type: str = "mlp"  # "mlp" | "conv" (reference gcn)
    # Warm-start semantics across the deq_iter loop:
    # "solution"  — reference-exact (policies.py:647-667): the tracker is
    #               seeded from the DEQ proposal only on the FIRST iterate;
    #               afterwards it warm-starts from its own previous
    #               solution and feels the new proposal through the
    #               tracking cost only. Successive solves refine one
    #               trajectory → lower final loss at loose AL budgets.
    # "proposal"  — re-seed x_init from the fresh DEQ proposal every
    #               iterate (this repo's original behavior; a harder
    #               projection each iterate, more aggressive but less
    #               stable at loose budgets). Default, for compatibility
    #               with checkpoints trained before ws_mode existed (their
    #               meta.json carries no ws_mode; eval must reproduce the
    #               iteration operator they were trained with).
    ws_mode: str = "proposal"

    @nn.compact
    def __call__(self, x: Array, qp_solve: bool = True,
                 lastqp_solve: bool = False) -> Tuple[List[DEQMPCRollout], Array]:
        bsz = x.shape[0]
        layer = DEQLayer(nx=self.nx, nu=self.nu, nq=self.nq, T=self.T,
                         hdim=self.hdim, dt=self.dt, out_type=self.out_type,
                         layer_type=self.layer_type)
        z = layer.init_z(bsz, x.dtype)
        x_ref_flat = jnp.tile(x, (1, self.T))  # initial estimate: current
        # state repeated (policies.py:455)
        actions = jnp.zeros((bsz, self.T, self.nu), x.dtype)
        al_state = self.tracking.init_state(bsz, x.dtype)

        iterates = []
        x_ref = None
        x_ws = None  # previous-solution warm start ("solution" mode)
        u_ws = actions
        for it_i in range(self.deq_iter):
            x_ref, z = layer(x, x_ref_flat, z)
            if self.out_type == 1:
                x_ref = jnp.concatenate([x[:, None], x_ref], axis=1)
            net_states = x_ref
            states, acts = net_states, actions
            if qp_solve:
                if self.ws_mode == "solution" and it_i > 0:
                    # reference semantics: warm-start from the previous
                    # solution (carried in al_state when the tracker
                    # carries state, explicit x_ws/u_ws when stateless).
                    # The cost's u_ref is ALSO the previous solution's
                    # actions (reference u_ref_tr = nominal_actions,
                    # policies.py:497,509) — zeros only before the first
                    # solve.
                    xi, ui = (None, None) if self.tracking.carry \
                        else (x_ws, u_ws)
                else:
                    xi, ui = x_ref, actions
                states, acts, al_state, _ = self.tracking.solve(
                    x, x_ref, actions, al_state, x_init=xi, u_init=ui)
            iterates.append(DEQMPCRollout(net_states=net_states,
                                          states=states, actions=acts))
            actions = jax.lax.stop_gradient(acts)
            x_ws = jax.lax.stop_gradient(states)
            u_ws = actions
            # solution feeds the next equilibrium iteration, detached
            # (policies.py:517-518)
            x_ref_flat = jax.lax.stop_gradient(states).reshape(bsz, -1)

        if lastqp_solve and not qp_solve:
            states, acts, al_state, _ = self.tracking.solve(
                x, x_ref, actions, al_state, x_init=x_ref, u_init=actions)
            iterates[-1] = DEQMPCRollout(
                net_states=iterates[-1].net_states, states=states, actions=acts)

        # dynamics residual of the final reference (policies.py:521-522)
        xr = iterates[-1].states
        x_next = self.tracking.model(
            xr[:, :-1].reshape(-1, self.nx),
            iterates[-1].actions[:, :-1].reshape(-1, self.nu),
        ).reshape(bsz, self.T - 1, self.nx)
        dyn_res = jnp.linalg.norm(
            (xr[:, 1:] - x_next).reshape(bsz, -1), axis=-1).mean()
        return iterates, dyn_res


class NNMPCPolicy(nn.Module):
    """Feedforward net + tracking MPC (policies.py:689-716)."""

    nx: int
    nu: int
    nq: int
    T: int
    hdim: int
    tracking: TrackingMPC

    @nn.compact
    def __call__(self, x: Array):
        from diff_qp_mpc_tpu.learning.deq import FFDNetwork

        bsz = x.shape[0]
        pos_ref = FFDNetwork(nq=self.nq, T=self.T, hdim=self.hdim)(x)
        x_ref = jnp.concatenate(
            [pos_ref, jnp.zeros((bsz, self.T, self.nx - self.nq), x.dtype)], -1)
        al_state = self.tracking.init_state(bsz, x.dtype)
        u0 = jnp.zeros((bsz, self.T, self.nu), x.dtype)
        states, actions, _, _ = self.tracking.solve(x, x_ref, u0, al_state)
        return states, actions
