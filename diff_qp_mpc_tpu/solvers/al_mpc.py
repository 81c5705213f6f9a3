"""Augmented-Lagrangian MPC — the solver under DEQ-MPC training.

Rebuild of qpth/AL_mpc.py (MPC.forward/al_solve) + the NewtonAL implicit
backward (qpth/al_utils.py:465-500), with three structural changes for TPU:

1. All warm-start state (λ, ρ, x/u inits, cost/λ/ρ history) is an explicit
   ``ALState`` pytree threaded by the caller instead of torch module
   attributes (AL_mpc.py:250-252,314-318) — required for jit/scan purity
   and for sharding the batch axis.
2. The inner Newton solve uses the block-tridiagonal Cholesky
   (ops.btsolve) instead of a dense (T·n)² Cholesky.
3. Differentiation is a ``jax.custom_vjp``: one extra block-tridiagonal
   solve H·g = −∂L/∂τ at the solution, then dCd = g⊙τ, dc = g
   (the reference's diag-Q implicit backward, al_utils.py:465-500).

Solves::

    min_{x,u} Σₜ ½ τₜᵀ Cₜ τₜ + cₜᵀ τₜ
    s.t. x_{t+1} = f(x_t, u_t), x_0 = x0, u_lo ≤ u ≤ u_hi
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from diff_qp_mpc_tpu.core.types import ALState, Bounds, DiagQuadCost, Lambdas, SolveStats
from diff_qp_mpc_tpu.models.base import DynamicsModel, step_with_jac
from diff_qp_mpc_tpu.ops import almerit, btsolve, newton_al

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ALConfig:
    """Static solver budget (reference defaults: AL_mpc.py:121 al_iter=2;
    al_utils.py:397 ≤4 Newton steps; al_utils.py:504 20-candidate line
    search; AL_mpc.py:307 ρ←10ρ)."""

    al_iter: int = 2
    n_newton: int = 4
    n_ls: int = 20
    rho_factor: float = 10.0
    # Cap on ρ: without it, warm-started receding-horizon use grows ρ by
    # rho_factor^al_iter per call and overflows within a few calls (the
    # reference gestures at the same cap in a commented-out line,
    # AL_mpc.py:306 `rho = torch.minimum(..., rho_init*100)`).
    rho_max: float = 1e6
    reg: float = 1e-7
    use_line_search: bool = True
    # block-tridiagonal KKT kernel: "scan" | "pallas" | "auto" (pallas on TPU)
    kernel: str = "auto"
    # run Pallas kernels in interpreter mode (CPU testing of the fused path)
    interpret: bool = False
    # unrolled line-search candidate sweep in the fused kernel (bitwise-
    # identical results; overlaps transcendental latency across candidates
    # — measured 1.2x on v5e, benchmarks/roofline_fused.py)
    ls_unroll: bool = False


def warm_start(lam: Lambdas, rho: Array, cost_start: Array, state: ALState
               ) -> Tuple[Lambdas, Array]:
    """History-based AL warm start (reference: al_utils.py:16-34
    warm_start_al): pick the most recent history entry whose cost beats the
    incoming cost, rescale λ to that entry's magnitude, take its ρ."""
    hist_cost = state.hist_cost[::-1]  # most recent first
    hist_rho = state.hist_rho[::-1]
    hist_lam = jax.tree.map(lambda a: a[::-1], state.hist_lam)

    mask = hist_cost < cost_start[None]  # [H, bsz]
    idx = jnp.argmax(mask, axis=0)  # first improving entry (0 if none — the
    # most recent entry — matching torch.max-on-bool semantics)

    def _sel(a):
        # batch-aligned gather along the history axis ([H, bsz, ...] → [bsz,
        # ...]); a[idx, arange(bsz)] would pair a sharded index with an iota
        # and force an all-gather under a batch-sharded mesh
        idx_e = idx.reshape((1, idx.shape[0]) + (1,) * (a.ndim - 2))
        return jnp.take_along_axis(a, idx_e, axis=0)[0]

    lam_sel = jax.tree.map(_sel, hist_lam)
    norm_sel = jnp.linalg.norm(lam_sel.flat(), axis=-1)
    norm_cur = jnp.linalg.norm(lam.flat(), axis=-1)
    scale = norm_sel / (norm_cur + 1e-12)
    lam_new = jax.tree.map(
        lambda a: a * scale.reshape((-1,) + (1,) * (a.ndim - 1)), lam
    )
    rho_new = _sel(hist_rho)
    return lam_new, rho_new


def _push_hist(state_hist, entry):
    """Roll a [H, ...] history buffer, appending `entry` at the end."""
    return jnp.concatenate([state_hist[1:], entry[None]], axis=0)


def _al_core(dynamics: DynamicsModel, cfg: ALConfig, cost: DiagQuadCost,
             x0: Array, bounds: Bounds, state: ALState,
             x_init: Optional[Array], u_init: Optional[Array]):
    """Pure forward AL solve. Returns (xu, new_state, stats, D, O)."""
    bsz, T, nx = state.x.shape
    nu = state.u.shape[-1]
    dyn = dynamics  # batched step via __call__
    dyn_jac = step_with_jac(dynamics.step)

    u = u_init if u_init is not None else state.u
    x_roll = dynamics.rollout(x0, u)
    if x_init is not None:
        x = x_init
    else:
        x = jnp.where(state.just_initialized, x_roll, state.x)

    lam = state.lam
    rho = state.rho

    xu = jnp.concatenate([x, u], axis=-1)
    cost_start = almerit.compute_cost(cost, xu)
    lam_ws, rho_ws = warm_start(lam, rho, cost_start, state)
    lam = jax.tree.map(
        lambda a, b: jnp.where(state.just_initialized, a, b), lam, lam_ws
    )
    rho = jnp.where(state.just_initialized, rho, rho_ws)
    rho = jnp.clip(rho, 1e-3, cfg.rho_max)

    hist_cost = _push_hist(state.hist_cost, cost_start)
    hist_lam = jax.tree.map(_push_hist, state.hist_lam, lam)
    hist_rho = _push_hist(state.hist_rho, rho)

    # ---- AL outer iterations (reference: AL_mpc.py:285-311) ----
    # lax.scan (not a Python loop): al_iter trip bodies share one trace,
    # cutting compile time ~al_iter-fold on TPU.
    newton_kwargs = dict(n_newton=cfg.n_newton, n_ls=cfg.n_ls, reg=cfg.reg,
                         use_line_search=cfg.use_line_search,
                         kernel=cfg.kernel)
    bsz = xu.shape[0]
    n = xu.shape[-1]
    T = xu.shape[1]
    D0 = jnp.zeros((bsz, T, n, n), xu.dtype)
    O0 = jnp.zeros((bsz, T - 1, n, n), xu.dtype)
    stats0 = SolveStats(
        dyn_res=jnp.zeros((bsz,), xu.dtype),
        cost=cost_start,
        merit=jnp.zeros((bsz,), xu.dtype),
        newton_steps=jnp.asarray(cfg.al_iter * cfg.n_newton, jnp.int32),
        step_size=jnp.zeros((bsz,), xu.dtype),
    )

    def al_body(carry, _):
        xu, lam, rho, hist_cost, hist_lam, hist_rho, _D, _O, _stats = carry
        result = newton_al.newton_al(
            cost, dyn, dyn_jac, xu, x0, bounds, lam, rho, **newton_kwargs
        )
        xu = result.xu
        res = almerit.residuals(dyn, xu[..., :nx], xu[..., nx:], x0, bounds)
        lam = almerit.lambda_update(lam, res, rho)
        cost_now = almerit.compute_cost(cost, xu)
        rho = jnp.minimum(rho * cfg.rho_factor, cfg.rho_max)
        hist_cost = _push_hist(hist_cost, cost_now)
        hist_lam = jax.tree.map(_push_hist, hist_lam, lam)
        hist_rho = _push_hist(hist_rho, rho)
        stats = SolveStats(
            dyn_res=res.clamped().flat_norm(),
            cost=cost_now,
            merit=result.merit,
            newton_steps=jnp.asarray(cfg.al_iter * cfg.n_newton, jnp.int32),
            step_size=result.step_size,
        )
        return (xu, lam, rho, hist_cost, hist_lam, hist_rho,
                result.D, result.O, stats), None

    (xu, lam, rho, hist_cost, hist_lam, hist_rho, D, O, stats), _ = jax.lax.scan(
        al_body,
        (xu, lam, rho, hist_cost, hist_lam, hist_rho, D0, O0, stats0),
        None,
        length=cfg.al_iter,
    )

    x_out, u_out = xu[..., :nx], xu[..., nx:]
    new_state = ALState(
        x=x_out, u=u_out, lam=lam, rho=rho,
        hist_cost=hist_cost, hist_lam=hist_lam, hist_rho=hist_rho,
        hist_filled=jnp.minimum(
            state.hist_filled + cfg.al_iter + 1, state.hist_cost.shape[0]
        ),
        just_initialized=jnp.zeros((), bool),
    )
    return xu, new_state, stats, D, O


def _sanitize_implicit_grad(g):
    """Drop batch elements whose implicit H⁻¹ solve is numerically garbage.

    ρ at rho_max makes cond(H) ≈ ρ/reg; the f32 Cholesky then emits
    NaN/inf — or finite-but-meaningless huge values shortly BEFORE it
    emits inf. A legitimate solve is bounded by ||ct||/λ_min(H) ≤
    ||ct||/reg ≈ 1e5 at the default budgets; anything orders beyond that
    is breakdown, and one singular element must not poison the batch
    gradient (reference-class INACC_ERR semantics, batch_LU.py:83-148).
    Without the magnitude guard this is exactly how the r4 quadrotor
    fused-f32 run died: finite ~1e30 elements → inf downstream →
    clip_by_global_norm scales by 10/inf = 0 → 0·inf = NaN into Adam.
    """
    g = jnp.where(jnp.isfinite(g), g, 0.0)
    bad = jnp.max(jnp.abs(g), axis=(1, 2), keepdims=True) > 1e8
    return jnp.where(bad, 0.0, g)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _al_solve_diff(dynamics, cfg, cost, x0, bounds, state, x_init, u_init):
    xu, new_state, stats, _, _ = _al_core(
        dynamics, cfg, cost, x0, bounds, state, x_init, u_init
    )
    return xu, new_state, stats


def _al_solve_fwd(dynamics, cfg, cost, x0, bounds, state, x_init, u_init):
    xu, new_state, stats, D, O = _al_core(
        dynamics, cfg, cost, x0, bounds, state, x_init, u_init
    )
    return (xu, new_state, stats), (xu, D, O, cost, x0, bounds, state, x_init, u_init)


def _al_solve_bwd(dynamics, cfg, residuals_saved, cotangents):
    xu, D, O, cost, x0, bounds, state, x_init, u_init = residuals_saved
    ct_xu, _ct_state, _ct_stats = cotangents

    # Implicit function theorem at the (approximate) stationary point:
    # H g = −ḡ with H the final GN merit Hessian (reference:
    # al_utils.py:465-479 reuses the saved Cholesky; the block factor here
    # is cheap enough to recompute from the saved blocks). The x₀
    # coordinates are pinned (dx₀/dθ = 0), so their cotangent is dropped
    # before the solve — D/O are the pinned blocks.
    nx0 = x0.shape[-1]
    ct_xu = ct_xu.at[:, 0, :nx0].set(0.0)
    from diff_qp_mpc_tpu.ops import newton_al as newton_al_mod

    g = -newton_al_mod.kkt_solver(cfg.kernel)(D, O, ct_xu, cfg.reg)
    g = _sanitize_implicit_grad(g)
    dCd = g * xu  # diag-Q gradient (al_utils.py:482)
    dc = g  # (al_utils.py:484)

    d_cost = jax.tree.map(jnp.zeros_like, cost)
    d_cost = dataclasses.replace(d_cost, Cd=dCd.astype(cost.Cd.dtype),
                                 c=dc.astype(cost.c.dtype))
    zeros = lambda v: None if v is None else jax.tree.map(jnp.zeros_like, v)
    return (d_cost, zeros(x0), zeros(bounds), zeros(state),
            zeros(x_init), zeros(u_init))


_al_solve_diff.defvjp(_al_solve_fwd, _al_solve_bwd)


def shift(state: ALState, keep_multipliers: bool = False) -> ALState:
    """Advance warm-start state by one step for receding-horizon control.

    The reference reuses the previous solution unshifted as the next call's
    init (AL_mpc.py:250-252) and relies on per-episode ``reinitialize`` —
    which diverges in closed loop (stale multipliers, misaligned
    trajectories). The standard recipe implemented here: shift x/u left by
    one (repeating the tail), and reset multipliers/penalty/history unless
    ``keep_multipliers`` (they correspond to the previous, shifted
    problem).
    """
    x = jnp.concatenate([state.x[:, 1:], state.x[:, -1:]], axis=1)
    u = jnp.concatenate([state.u[:, 1:], state.u[:, -1:]], axis=1)
    bsz, T, nx = x.shape
    nu = u.shape[-1]
    if keep_multipliers:
        lam_dyn = jnp.concatenate(
            [state.lam.lam_dyn[:, 1:], state.lam.lam_dyn[:, -1:]], axis=1
        )
        lam = Lambdas(
            lam_dyn=lam_dyn,
            lam_init=jnp.zeros_like(state.lam.lam_init),
            lam_hi=jnp.concatenate(
                [state.lam.lam_hi[:, 1:], state.lam.lam_hi[:, -1:]], axis=1
            ),
            lam_lo=jnp.concatenate(
                [state.lam.lam_lo[:, 1:], state.lam.lam_lo[:, -1:]], axis=1
            ),
        )
        return dataclasses.replace(
            state, x=x, u=u, lam=lam,
            just_initialized=jnp.ones((), bool),  # skip cost-history warm start
        )
    fresh = ALState.init(bsz, T, nx, nu,
                         hist_len=state.hist_cost.shape[0], dtype=x.dtype)
    # just_initialized=False so the shifted x/u warm starts are used; the
    # fresh (inf-cost) history makes the warm-start selection a no-op
    # (λ stays 0, ρ returns to 1).
    return dataclasses.replace(fresh, x=x, u=u,
                               just_initialized=jnp.zeros((), bool))


def solve(dynamics: DynamicsModel, cost: DiagQuadCost, x0: Array,
          bounds: Bounds, state: ALState, cfg: ALConfig = ALConfig(),
          x_init: Optional[Array] = None, u_init: Optional[Array] = None,
          differentiable: bool = True):
    """AL-MPC solve. Returns (x, u, new_state, stats).

    ``state`` carries warm starts across receding-horizon calls; build a
    fresh one with ``ALState.init`` (≙ reference ``reinitialize``,
    AL_mpc.py:432-439). Gradients flow to ``cost`` only (diag Q), matching
    the reference's NewtonAL backward.
    """
    nx = x0.shape[-1]
    if differentiable:
        xu, new_state, stats = _al_solve_diff(
            dynamics, cfg, cost, x0, bounds, state, x_init, u_init
        )
    else:
        xu, new_state, stats, _, _ = _al_core(
            dynamics, cfg, cost, x0, bounds, state, x_init, u_init
        )
    new_state = jax.lax.stop_gradient(new_state)
    return xu[..., :nx], xu[..., nx:], new_state, stats


# ---------------------------------------------------------------------------
# Fused whole-solver path (ops/al_fused_pallas): the complete AL solve as one
# Pallas program. Fresh λ/ρ semantics (the reinitialized-per-forward DEQ-MPC
# training configuration). Differentiable via the same implicit backward as
# the scan path — the final GN Hessian blocks are recomputed outside the
# kernel from the returned solution and multipliers.
# ---------------------------------------------------------------------------


# bounds travel as STATIC float tuples (u_lo, u_hi): the fused kernel
# closes over them as compile-time constants, and passing them through the
# custom_vjp boundary would wrap them in tracers.
@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_solve_diff(dynamics, cfg, bounds_t, cost, x0, x_init, u_init):
    xu, res = _fused_core(dynamics, cfg, bounds_t, cost, x0,
                          x_init, u_init)[:2]
    return xu, res


def _fused_core(dynamics, cfg, bounds_t, cost, x0, x_init, u_init):
    from diff_qp_mpc_tpu.ops.al_fused_pallas import fused_al_solve

    u_lo, u_hi = bounds_t
    xu, lamd, lamh, laml, res = fused_al_solve(
        dynamics, cost.Cd, cost.c, x0, u_lo, u_hi,
        x_init, u_init, al_iter=cfg.al_iter, n_newton=cfg.n_newton,
        n_ls=cfg.n_ls, rho_factor=cfg.rho_factor, rho_max=cfg.rho_max,
        reg=cfg.reg, interpret=cfg.interpret, ls_unroll=cfg.ls_unroll)
    return xu, res, lamd, lamh, laml


def _fused_DO(dynamics, cfg, cost, x0, bounds, xu, lamd, lamh, laml,
              rho=None):
    """Final pinned GN Hessian blocks for the implicit backward.

    The backward Hessian uses the λ/ρ that produced the final Newton step:
    λ after al_iter−1 outer updates, ρ = min(rho_factor^(al_iter−1),
    rho_max) — both deterministic for the fresh-state fused path (pass
    ``rho`` [bsz, 1] explicitly for the warm-started stateful path). The
    kernel returns λ after the FINAL update; one update beyond the last
    Newton solve only perturbs the GN Hessian through the active-set
    masks, so the returned multipliers are used directly.
    """
    nx = x0.shape[-1]
    bsz = x0.shape[0]
    lam = Lambdas(lam_dyn=lamd, lam_init=jnp.zeros((bsz, nx), xu.dtype),
                  lam_hi=lamh, lam_lo=laml)
    if rho is None:
        rho_last = min(cfg.rho_factor ** (cfg.al_iter - 1), cfg.rho_max)
        rho = jnp.full((bsz, 1), rho_last, xu.dtype)
    dyn_jac = step_with_jac(dynamics.step)
    g, D, O, _ = almerit.merit_grad_hess(
        cost, dyn_jac, xu[..., :nx], xu[..., nx:], x0, bounds, lam, rho)
    _, D, O = newton_al.pin_first_state(g, D, O, nx)
    return D, O


def _fused_solve_fwd(dynamics, cfg, bounds_t, cost, x0, x_init, u_init):
    xu, res, lamd, lamh, laml = _fused_core(
        dynamics, cfg, bounds_t, cost, x0, x_init, u_init)
    bounds = Bounds(u_lo=jnp.asarray(bounds_t[0], x0.dtype),
                    u_hi=jnp.asarray(bounds_t[1], x0.dtype))
    D, O = _fused_DO(dynamics, cfg, cost, x0, bounds, xu, lamd, lamh, laml)
    return (xu, res), (xu, D, O, cost, x0, x_init, u_init)


def _fused_solve_bwd(dynamics, cfg, bounds_t, saved, cts):
    xu, D, O, cost, x0, x_init, u_init = saved
    ct_xu, _ct_res = cts
    nx0 = x0.shape[-1]
    ct_xu = ct_xu.at[:, 0, :nx0].set(0.0)
    g = -newton_al.kkt_solver(cfg.kernel)(D, O, ct_xu, cfg.reg)
    g = _sanitize_implicit_grad(g)
    d_cost = dataclasses.replace(
        jax.tree.map(jnp.zeros_like, cost),
        Cd=(g * xu).astype(cost.Cd.dtype), c=g.astype(cost.c.dtype))
    zeros = lambda v: jax.tree.map(jnp.zeros_like, v)
    return (d_cost, zeros(x0), zeros(x_init), zeros(u_init))


_fused_solve_diff.defvjp(_fused_solve_fwd, _fused_solve_bwd)


def solve_fused(dynamics: DynamicsModel, cost: DiagQuadCost, x0: Array,
                bounds: Bounds, cfg: ALConfig = ALConfig(),
                x_init: Optional[Array] = None,
                u_init: Optional[Array] = None,
                differentiable: bool = True):
    """Whole-solver fused AL-MPC (see ops/al_fused_pallas). Fresh λ/ρ each
    call; returns (x, u, dyn_res). For models whose step is elementwise
    (pendulum/integrator/CartpoleCosSin). Gradients flow to cost (Cd, c).
    """
    import numpy as _np

    nx = x0.shape[-1]
    bsz = x0.shape[0]
    bounds_t = (tuple(float(v) for v in _np.asarray(bounds.u_lo)),
                tuple(float(v) for v in _np.asarray(bounds.u_hi)))
    if u_init is None:
        u_init = jnp.zeros((bsz, cost.Cd.shape[1], dynamics.nu), x0.dtype)
    if x_init is None:
        x_init = dynamics.rollout(jax.lax.stop_gradient(x0), u_init)
    if differentiable:
        xu, res = _fused_solve_diff(dynamics, cfg, bounds_t, cost, x0,
                                    x_init, u_init)
    else:
        xu, res = _fused_core(dynamics, cfg, bounds_t, cost, x0,
                              x_init, u_init)[:2]
    return xu[..., :nx], xu[..., nx:], res


# ---------------------------------------------------------------------------
# Stateful fused path: the scan path's FULL ALState carry (λ/ρ warm start,
# cost/λ/ρ history, receding-horizon reuse) on the fused kernel. The kernel
# is driven one AL iteration at a time so the per-iteration history pushes
# and λ/ρ updates happen in plain JAX exactly as _al_core does them — the
# two paths then implement the SAME operator (round-2 verdict: fused-fresh
# vs scan-carry semantics drift cost 1.00→0.84 / 0.72→0.58 on cross-path
# checkpoint evals). Per-call kernel-launch overhead is negligible: al_iter
# is 2 at training budgets and each launch re-reads only O(bsz·T·n) floats.
# ---------------------------------------------------------------------------


def _fused_stateful_core(dynamics, cfg, bounds_t, cost, x0, state,
                         x_init, u_init):
    """Returns (xu, new_state, stats, rho_last) — entry logic is a mirror
    of _al_core (same warm_start / history semantics)."""
    from diff_qp_mpc_tpu.ops.al_fused_pallas import fused_al_solve

    bsz, T, nx = state.x.shape
    u = u_init if u_init is not None else state.u
    x_roll = dynamics.rollout(jax.lax.stop_gradient(x0), u)
    if x_init is not None:
        x = x_init
    else:
        x = jnp.where(state.just_initialized, x_roll, state.x)

    lam = state.lam
    rho = state.rho

    xu = jnp.concatenate([x, u], axis=-1)
    cost_start = almerit.compute_cost(cost, xu)
    lam_ws, rho_ws = warm_start(lam, rho, cost_start, state)
    lam = jax.tree.map(
        lambda a, b: jnp.where(state.just_initialized, a, b), lam, lam_ws
    )
    rho = jnp.where(state.just_initialized, rho, rho_ws)
    rho = jnp.clip(rho, 1e-3, cfg.rho_max)

    hist_cost = _push_hist(state.hist_cost, cost_start)
    hist_lam = jax.tree.map(_push_hist, state.hist_lam, lam)
    hist_rho = _push_hist(state.hist_rho, rho)

    u_lo, u_hi = bounds_t
    rho_last = rho
    res = None
    for _ in range(cfg.al_iter):  # static, small (2 at training budgets)
        rho_last = rho  # the ρ producing this (possibly final) Newton solve
        xu, lamd, lamh, laml, res = fused_al_solve(
            dynamics, cost.Cd, cost.c, x0, u_lo, u_hi,
            xu[..., :nx], xu[..., nx:],
            al_iter=1, n_newton=cfg.n_newton, n_ls=cfg.n_ls,
            rho_factor=cfg.rho_factor, rho_max=cfg.rho_max,
            reg=cfg.reg, interpret=cfg.interpret,
            ls_unroll=cfg.ls_unroll,
            lam_dyn=lam.lam_dyn, lam_hi=lam.lam_hi, lam_lo=lam.lam_lo,
            rho0=rho[:, 0])
        lam = Lambdas(lam_dyn=lamd,
                      lam_init=jnp.zeros_like(lam.lam_init),
                      lam_hi=lamh, lam_lo=laml)
        # the kernel applies ρ ← min(ρ·factor, rho_max) after its λ update;
        # replicate the carried value here (deterministic elementwise map)
        rho = jnp.minimum(rho * cfg.rho_factor, cfg.rho_max)
        cost_now = almerit.compute_cost(cost, xu)
        hist_cost = _push_hist(hist_cost, cost_now)
        hist_lam = jax.tree.map(_push_hist, hist_lam, lam)
        hist_rho = _push_hist(hist_rho, rho)

    new_state = ALState(
        x=xu[..., :nx], u=xu[..., nx:], lam=lam, rho=rho,
        hist_cost=hist_cost, hist_lam=hist_lam, hist_rho=hist_rho,
        hist_filled=jnp.minimum(
            state.hist_filled + cfg.al_iter + 1, state.hist_cost.shape[0]),
        just_initialized=jnp.zeros((), bool),
    )
    stats = SolveStats(
        dyn_res=res, cost=almerit.compute_cost(cost, xu),
        merit=jnp.zeros((bsz,), xu.dtype),
        newton_steps=jnp.asarray(cfg.al_iter * cfg.n_newton, jnp.int32),
        step_size=jnp.zeros((bsz,), xu.dtype),
    )
    return xu, new_state, stats, rho_last


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_stateful_diff(dynamics, cfg, bounds_t, cost, x0, state,
                         x_init, u_init):
    xu, new_state, stats, _ = _fused_stateful_core(
        dynamics, cfg, bounds_t, cost, x0, state, x_init, u_init)
    return xu, new_state, stats


def _fused_stateful_fwd(dynamics, cfg, bounds_t, cost, x0, state,
                        x_init, u_init):
    xu, new_state, stats, rho_last = _fused_stateful_core(
        dynamics, cfg, bounds_t, cost, x0, state, x_init, u_init)
    bounds = Bounds(u_lo=jnp.asarray(bounds_t[0], x0.dtype),
                    u_hi=jnp.asarray(bounds_t[1], x0.dtype))
    D, O = _fused_DO(dynamics, cfg, cost, x0, bounds, xu,
                     new_state.lam.lam_dyn, new_state.lam.lam_hi,
                     new_state.lam.lam_lo, rho=rho_last)
    return (xu, new_state, stats), (xu, D, O, cost, x0, state, x_init, u_init)


def _fused_stateful_bwd(dynamics, cfg, bounds_t, saved, cts):
    xu, D, O, cost, x0, state, x_init, u_init = saved
    ct_xu, _ct_state, _ct_stats = cts
    nx0 = x0.shape[-1]
    ct_xu = ct_xu.at[:, 0, :nx0].set(0.0)
    g = -newton_al.kkt_solver(cfg.kernel)(D, O, ct_xu, cfg.reg)
    g = _sanitize_implicit_grad(g)
    d_cost = dataclasses.replace(
        jax.tree.map(jnp.zeros_like, cost),
        Cd=(g * xu).astype(cost.Cd.dtype), c=g.astype(cost.c.dtype))
    zeros = lambda v: None if v is None else jax.tree.map(jnp.zeros_like, v)
    return (d_cost, zeros(x0), zeros(state), zeros(x_init), zeros(u_init))


_fused_stateful_diff.defvjp(_fused_stateful_fwd, _fused_stateful_bwd)


def solve_fused_stateful(dynamics: DynamicsModel, cost: DiagQuadCost,
                         x0: Array, bounds: Bounds, state: ALState,
                         cfg: ALConfig = ALConfig(),
                         x_init: Optional[Array] = None,
                         u_init: Optional[Array] = None,
                         differentiable: bool = True):
    """Fused-kernel AL-MPC with the scan path's full warm-start carry.

    Drop-in equivalent of :func:`solve` (same signature and semantics —
    ALState warm starts, history-based λ/ρ selection, implicit cost
    gradients) executed on the whole-solver Pallas kernel. Checkpoints
    train/eval interchangeably between this and the scan path.
    """
    import numpy as _np

    nx = x0.shape[-1]
    bounds_t = (tuple(float(v) for v in _np.asarray(bounds.u_lo)),
                tuple(float(v) for v in _np.asarray(bounds.u_hi)))
    if differentiable:
        xu, new_state, stats = _fused_stateful_diff(
            dynamics, cfg, bounds_t, cost, x0, state, x_init, u_init)
    else:
        xu, new_state, stats, _ = _fused_stateful_core(
            dynamics, cfg, bounds_t, cost, x0, state, x_init, u_init)
    new_state = jax.lax.stop_gradient(new_state)
    return xu[..., :nx], xu[..., nx:], new_state, stats
