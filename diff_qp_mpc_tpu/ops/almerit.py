"""Augmented-Lagrangian merit numerics, block-structured.

TPU-native rebuild of qpth/al_utils.py:37-360 (merit_function,
merit_grad_hessian, constraint_res_jac2, dyn_res_eq_jac, dyn_res_ineq_jac,
compute_cost*). The reference materializes the full constraint Jacobian
J ∈ R^{(neq+nineq) × T·n} and forms JᵀJ with a dense bmm; here every
quantity is assembled directly in block-tridiagonal form so the Newton step
feeds straight into ops.btsolve with O(T·n³) work and O(T·n²) memory.

Problem (same as reference, AL_mpc.py docstring):
    min_{x,u}  Σₜ ½ τₜᵀ Cₜ τₜ + cₜᵀ τₜ
    s.t.       r_dyn[t]  = x[t+1] − f(x[t], u[t]) = 0      t = 0..T−2
               r_init    = x[0] − x0 = 0
               r_hi[t]   = u[t] − u_hi ≤ 0
               r_lo[t]   = u_lo − u[t] ≤ 0

Merit (reference semantics, al_utils.py:55-59):
    M = cost + λᵀ r_raw + (ρ/2)‖r_clamp‖²
where equality residuals are never clamped and inequality residuals are
clamped at 0 inside the penalty.

Jacobian block structure (w_t = (x_t, u_t), n = nx+nu):
    ∂r_dyn[t]/∂w_t   = [−A_t, −B_t]       ∂r_dyn[t]/∂w_{t+1} = [I, 0]
    ∂r_init/∂w_0     = [I, 0]
    ∂r_hi[t]/∂u_t    =  I                 ∂r_lo[t]/∂u_t      = −I
so JᵀJ has diagonal blocks D_t and one subdiagonal block
O_t = (JᵀJ)[t+1, t] = [[−A_t, −B_t], [0, 0]].
"""
from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp

from diff_qp_mpc_tpu.core.types import Bounds, DiagQuadCost, Lambdas, QuadCost

# Full-precision einsums: the GN Hessian blocks must stay SPD in f32 on TPU
# (MXU reduced-precision default breaks the downstream Cholesky).
_PREC = jax.lax.Precision.HIGHEST

Array = jnp.ndarray
Cost = Union[QuadCost, DiagQuadCost]


class Residuals(NamedTuple):
    r_dyn: Array  # [bsz, T-1, nx]
    r_init: Array  # [bsz, nx]
    r_hi: Array  # [bsz, T, nu]
    r_lo: Array  # [bsz, T, nu]

    def clamped(self) -> "Residuals":
        return Residuals(
            self.r_dyn, self.r_init,
            jnp.maximum(self.r_hi, 0.0), jnp.maximum(self.r_lo, 0.0),
        )

    def flat_norm(self) -> Array:
        bsz = self.r_init.shape[0]
        parts = [p.reshape(bsz, -1) for p in self]
        return jnp.linalg.norm(jnp.concatenate(parts, axis=-1), axis=-1)


# ---------------------------------------------------------------------------
# Residuals
# ---------------------------------------------------------------------------


def residuals(dynamics, x: Array, u: Array, x0: Array, bounds: Bounds) -> Residuals:
    """All constraint residuals in one batched dynamics call
    (reference: al_utils.py:188-205 dyn_res_eq + 266-291 dyn_res_ineq)."""
    bsz, T, nx = x.shape
    nu = u.shape[-1]
    x_next = dynamics(x[:, :-1].reshape(-1, nx), u[:, :-1].reshape(-1, nu))
    r_dyn = x[:, 1:] - x_next.reshape(bsz, T - 1, nx)
    r_init = x[:, 0] - x0
    r_hi = u - bounds.u_hi
    r_lo = bounds.u_lo - u
    return Residuals(r_dyn, r_init, r_hi, r_lo)


def residuals_from_rollout(x: Array, u: Array, x0: Array, x_next: Array,
                           bounds: Bounds) -> Residuals:
    """Same, when f(x,u) along the trajectory was already evaluated."""
    r_dyn = x[:, 1:] - x_next
    r_init = x[:, 0] - x0
    return Residuals(r_dyn, r_init, u - bounds.u_hi, bounds.u_lo - u)


# ---------------------------------------------------------------------------
# Cost (diag and dense; reference al_utils.py:338-360)
# ---------------------------------------------------------------------------


def compute_cost(cost: Cost, xu: Array) -> Array:
    """Σₜ ½ τᵀCτ + cᵀτ. xu: [bsz, T, n] -> [bsz]."""
    if isinstance(cost, DiagQuadCost):
        quad = 0.5 * jnp.sum(xu * cost.Cd * xu, axis=(-1, -2))
    else:
        quad = 0.5 * jnp.einsum("bti,btij,btj->b", xu, cost.C, xu, precision=_PREC)
    lin = jnp.sum(cost.c * xu, axis=(-1, -2))
    return quad + lin


def cost_gradient(cost: Cost, xu: Array) -> Array:
    if isinstance(cost, DiagQuadCost):
        return cost.Cd * xu + cost.c
    return jnp.einsum("btij,btj->bti", cost.C, xu, precision=_PREC) + cost.c


def cost_hessian_blocks(cost: Cost, bsz: int, T: int, n: int) -> Array:
    """Diagonal blocks [bsz, T, n, n] of the cost Hessian."""
    if isinstance(cost, DiagQuadCost):
        Cd = jnp.broadcast_to(cost.Cd, (bsz, T, n))
        return jax.vmap(jax.vmap(jnp.diag))(Cd)
    return jnp.broadcast_to(cost.C, (bsz, T, n, n))


# ---------------------------------------------------------------------------
# Merit value / gradient / Hessian blocks
# ---------------------------------------------------------------------------


def merit_value(cost: Cost, res: Residuals, lam: Lambdas, rho: Array,
                xu: Array) -> Array:
    """[bsz] merit (reference: al_utils.py:37-59)."""
    bsz = xu.shape[0]
    c = compute_cost(cost, xu)
    rc = res.clamped()
    pen = sum(jnp.sum(p.reshape(bsz, -1) ** 2, axis=-1) for p in rc)
    lag = (
        jnp.sum(lam.lam_dyn * res.r_dyn, axis=(-1, -2))
        + jnp.sum(lam.lam_init * res.r_init, axis=-1)
        + jnp.sum(lam.lam_hi * res.r_hi, axis=(-1, -2))
        + jnp.sum(lam.lam_lo * res.r_lo, axis=(-1, -2))
    )
    return c + 0.5 * rho[:, 0] * pen + lag


def _jac_T_apply(A: Array, B: Array, v_dyn: Array, v_init: Array,
                 v_hi: Array, v_lo: Array) -> Tuple[Array, Array]:
    """Jᵀ v without materializing J.

    A: [bsz, T-1, nx, nx], B: [bsz, T-1, nx, nu] dynamics Jacobians.
    Returns (g_x [bsz, T, nx], g_u [bsz, T, nu]).
    """
    bsz, Tm1, nx, _ = A.shape
    nu = B.shape[-1]
    T = Tm1 + 1
    g_x = jnp.zeros((bsz, T, nx), A.dtype)
    g_u = jnp.zeros((bsz, T, nu), A.dtype)
    # ∂r_dyn[t]/∂x_t = -A_t, /∂u_t = -B_t  (t = 0..T-2)
    g_x = g_x.at[:, :-1].add(-jnp.einsum("btji,btj->bti", A, v_dyn, precision=_PREC))
    g_u = g_u.at[:, :-1].add(-jnp.einsum("btji,btj->bti", B, v_dyn, precision=_PREC))
    # ∂r_dyn[t]/∂x_{t+1} = I
    g_x = g_x.at[:, 1:].add(v_dyn)
    # ∂r_init/∂x_0 = I
    g_x = g_x.at[:, 0].add(v_init)
    # bounds rows
    g_u = g_u + v_hi - v_lo
    return g_x, g_u


def merit_grad_hess(cost: Cost, dynamics_jac, x: Array, u: Array, x0: Array,
                    bounds: Bounds, lam: Lambdas, rho: Array):
    """Merit gradient [bsz, T, n] and Gauss-Newton Hessian blocks
    (D: [bsz, T, n, n], O: [bsz, T-1, n, n]).

    dynamics_jac(x_flat, u_flat) -> (x_next, (J_x, J_u)) batched, as
    produced by models.base.step_with_jac. One call covers the whole
    (batch × horizon) grid (reference does the same flattening,
    al_utils.py:212-226, then densifies — we never do).
    """
    bsz, T, nx = x.shape
    nu = u.shape[-1]
    n = nx + nu
    xu = jnp.concatenate([x, u], axis=-1)

    x_next_f, (A_f, B_f) = dynamics_jac(
        x[:, :-1].reshape(-1, nx), u[:, :-1].reshape(-1, nu)
    )
    x_next = x_next_f.reshape(bsz, T - 1, nx)
    A = A_f.reshape(bsz, T - 1, nx, nx)
    B = B_f.reshape(bsz, T - 1, nx, nu)

    res = residuals_from_rollout(x, u, x0, x_next, bounds)
    rc = res.clamped()
    m_hi = (res.r_hi > 0).astype(x.dtype)
    m_lo = (res.r_lo > 0).astype(x.dtype)

    # --- gradient: cost' + Jᵀλ + ρ J_clampᵀ r_clamp ---
    gx_l, gu_l = _jac_T_apply(A, B, lam.lam_dyn, lam.lam_init, lam.lam_hi, lam.lam_lo)
    gx_p, gu_p = _jac_T_apply(A, B, rc.r_dyn, rc.r_init, m_hi * rc.r_hi, m_lo * rc.r_lo)
    grad = (
        cost_gradient(cost, xu)
        + jnp.concatenate([gx_l, gu_l], axis=-1)
        + rho[:, :, None] * jnp.concatenate([gx_p, gu_p], axis=-1)
    )

    # --- Gauss-Newton Hessian blocks: cost Hessian + ρ J_clampᵀJ_clamp ---
    # GᵀG with G_t = [-A_t, -B_t]  → [[AᵀA, AᵀB], [BᵀA, BᵀB]]
    AtA = jnp.einsum("btki,btkj->btij", A, A, precision=_PREC)
    AtB = jnp.einsum("btki,btkj->btij", A, B, precision=_PREC)
    BtB = jnp.einsum("btki,btkj->btij", B, B, precision=_PREC)
    GtG = jnp.concatenate(
        [
            jnp.concatenate([AtA, AtB], axis=-1),
            jnp.concatenate([jnp.swapaxes(AtB, -1, -2), BtB], axis=-1),
        ],
        axis=-2,
    )  # [bsz, T-1, n, n]

    JtJ = jnp.zeros((bsz, T, n, n), x.dtype)
    JtJ = JtJ.at[:, :-1].add(GtG)
    # identity rows from r_dyn[t-1] on x_t (t ≥ 1) and from r_init on x_0
    eye_x = jnp.zeros((n, n), x.dtype).at[:nx, :nx].set(jnp.eye(nx, dtype=x.dtype))
    JtJ = JtJ + eye_x  # every t gets exactly one [I,0;0,0] contribution
    # active bound rows on the u-block diagonal
    act = m_hi + m_lo  # [bsz, T, nu]
    ii = jnp.arange(nu)
    JtJ = JtJ.at[:, :, nx + ii, nx + ii].add(act)

    D = cost_hessian_blocks(cost, bsz, T, n) + rho[:, :, None, None] * JtJ

    # subdiagonal: (JᵀJ)[t+1, t] = [I,0]ᵀ[-A,-B] → rows x: [-A, -B], rows u: 0
    O_top = jnp.concatenate([-A, -B], axis=-1)  # [bsz, T-1, nx, n]
    O = jnp.concatenate(
        [O_top, jnp.zeros((bsz, T - 1, nu, n), x.dtype)], axis=-2
    )
    O = rho[:, :, None, None] * O

    return grad, D, O, res


def lambda_update(lam: Lambdas, res: Residuals, rho: Array) -> Lambdas:
    """λ ← λ + ρ·r, with inequality multipliers clamped ≥ 0
    (reference: AL_mpc.py:300-301)."""
    r = rho[:, :, None]
    return Lambdas(
        lam_dyn=lam.lam_dyn + r * res.r_dyn,
        lam_init=lam.lam_init + rho * res.r_init,
        lam_hi=jnp.maximum(lam.lam_hi + r * res.r_hi, 0.0),
        lam_lo=jnp.maximum(lam.lam_lo + r * res.r_lo, 0.0),
    )
