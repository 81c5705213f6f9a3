"""Batched Riccati (LQR-KKT) factorization/solve.

The equality-constrained trajectory QP

    min_{dx,du}  Σₜ ½ dwₜᵀ C̃ₜ dwₜ + g̃ₜᵀ dwₜ
    s.t.         dx_{t+1} = Aₜ dxₜ + Bₜ duₜ + rₜ,    dx₀ given

is the KKT system the reference assembles dense and LU-factorizes
(qpth/qp_wrapper.py:638-679 compute_*_dense + qp.py:195-217 +
batch_LU.py:224). Its exact structure-exploiting factorization is the
backward Riccati recursion + affine forward rollout implemented here:
O(T·n³) per batch element, expressed as two lax.scans. This kernel solves
the *arbitrary-RHS* KKT system (gradients g̃, residual offsets r, initial
offset dx₀), which is exactly what an interior-point or SQP iteration needs
(the "partitioned Riccati as KKT solve" design, SURVEY.md §5).

Returned multipliers: ``lam[t]`` is the costate Pₜdxₜ + pₜ; the multiplier
of dynamics row t is lam[t+1], and of the initial-state row lam[0].
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

Array = jnp.ndarray
_PREC = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


def _mv(M, v):
    return jnp.einsum("...ij,...j->...i", M, v, precision=_PREC)


class LQRSolution(NamedTuple):
    dx: Array  # [T, nx]
    du: Array  # [T, nu]
    lam: Array  # [T, nx] costates
    K: Array  # [T, nu, nx] feedback gains (for rollout-based line search)
    k: Array  # [T, nu] feedforward terms


def lqr_kkt_solve(Cxx: Array, Cxu: Array, Cuu: Array, gx: Array, gu: Array,
                  A: Array, B: Array, r: Array, dx0: Array,
                  reg: float = 0.0, theta: Array | None = None) -> LQRSolution:
    """Single-instance solve (vmap over batch for the batched version).

    Cxx: [T, nx, nx], Cxu: [T, nx, nu], Cuu: [T, nu, nu] cost blocks;
    gx: [T, nx], gu: [T, nu] gradients; A: [T-1, nx, nx], B: [T-1, nx, nu],
    r: [T-1, nx] dynamics offsets; dx0: [nx] fixed initial value.
    reg: Levenberg damping added to Quu before inversion.

    theta: optional [T-1, nx] ≥ 0 — ELASTIC (relaxed) dynamics rows:
    solves the KKT system with  E dw − Θ dν = r  (Θ = diag(theta) per
    stage), which is what the SL1QP interior-point iteration produces after
    eliminating the elastic slack pairs (v, w) of sl1qp_mpc.py. The value
    recursion gains a proximal transform P̃ = (I + PΘ)⁻¹P,
    p̃ = (I + PΘ)⁻¹p (the Kalman-covariance-style relaxation); Θ = 0
    recovers the hard-constrained recursion exactly.
    """
    T, nx, nu = Cxu.shape
    dt = Cxx.dtype
    eyeu = jnp.eye(nu, dtype=dt)
    eyex = jnp.eye(nx, dtype=dt)

    # pad dynamics at t = T-1 (terminal step has no transition; with
    # P_T = 0 the padded A/B/r contribute nothing)
    Ap = jnp.concatenate([A, jnp.zeros((1, nx, nx), dt)], axis=0)
    Bp = jnp.concatenate([B, jnp.zeros((1, nx, nu), dt)], axis=0)
    rp = jnp.concatenate([r, jnp.zeros((1, nx), dt)], axis=0)
    if theta is None:
        thp = jnp.zeros((T, nx), dt)
    else:
        thp = jnp.concatenate([theta, jnp.zeros((1, nx), dt)], axis=0)

    def backward(carry, inp):
        P, p = carry
        Cxx_t, Cxu_t, Cuu_t, gx_t, gu_t, A_t, B_t, r_t, th_t = inp
        # elastic relaxation: P ← (I + PΘ)⁻¹P, p ← (I + PΘ)⁻¹p
        M = eyex + P * th_t[None, :]
        Pp = jnp.linalg.solve(M, jnp.concatenate([P, p[:, None]], axis=1))
        P = 0.5 * (Pp[:, :nx] + Pp[:, :nx].T)
        p = Pp[:, nx]
        PA = _mm(P, A_t)
        PB = _mm(P, B_t)
        m = _mv(P, r_t) + p
        Qxx = Cxx_t + _mm(A_t.T, PA)
        Qxu = Cxu_t + _mm(A_t.T, PB)
        Quu = Cuu_t + _mm(B_t.T, PB) + reg * eyeu
        qx = gx_t + _mv(A_t.T, m)
        qu = gu_t + _mv(B_t.T, m)
        cf = cho_factor(Quu)
        K = -cho_solve(cf, Qxu.T)  # [nu, nx]
        k = -cho_solve(cf, qu)
        P_new = Qxx + _mm(Qxu, K)
        # symmetrize against drift
        P_new = 0.5 * (P_new + P_new.T)
        p_new = qx + _mv(Qxu, k)
        return (P_new, p_new), (K, k, P_new, p_new)

    init = (jnp.zeros((nx, nx), dt), jnp.zeros((nx,), dt))
    inputs = (Cxx[::-1], Cxu[::-1], Cuu[::-1], gx[::-1], gu[::-1],
              Ap[::-1], Bp[::-1], rp[::-1], thp[::-1])
    _, (Ks, ks, Ps, ps) = jax.lax.scan(backward, init, inputs)
    K, k = Ks[::-1], ks[::-1]
    P, p = Ps[::-1], ps[::-1]
    # P/p rows are the POST-relaxation value functions of each stage; the
    # costate identity needs the PRE-relaxation (Pₜ, pₜ) of stage t, which
    # is exactly what the scan emitted for stage t (relaxation is applied
    # with Θ_{t-1} when consumed by stage t-1), so nothing extra needed.

    # forward affine rollout with elastic violation:
    # dx_{t+1} = (I + Θₜ Pₜ₊₁)⁻¹ (A dx + B du + r − Θₜ pₜ₊₁)
    P_next = jnp.concatenate([P[1:], jnp.zeros((1, nx, nx), dt)], axis=0)
    p_next = jnp.concatenate([p[1:], jnp.zeros((1, nx), dt)], axis=0)

    def forward(dx, inp):
        K_t, k_t, A_t, B_t, r_t, th_t, Pn, pn = inp
        du = _mv(K_t, dx) + k_t
        s_vec = _mv(A_t, dx) + _mv(B_t, du) + r_t
        Mf = jnp.eye(nx, dtype=dt) + th_t[:, None] * Pn
        dx_next = jnp.linalg.solve(Mf, s_vec - th_t * pn)
        return dx_next, (dx, du)

    _, (dxs, dus) = jax.lax.scan(
        forward, dx0, (K, k, Ap, Bp, rp, thp, P_next, p_next))
    # Lagrange multipliers: ν_{t-1} = −(∂V_t/∂x) = −(Pₜdxₜ + pₜ)
    lam = -(_mv(P, dxs) + p)
    return LQRSolution(dx=dxs, du=dus, lam=lam, K=K, k=k)


batched_lqr_kkt_solve = jax.vmap(
    lqr_kkt_solve,
    in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None),
)

batched_lqr_kkt_solve_elastic = jax.vmap(
    lqr_kkt_solve,
    in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None, 0),
)


def kkt_residual(Cxx, Cxu, Cuu, gx, gu, A, B, r, dx0, sol: LQRSolution):
    """Stationarity + feasibility residuals, for tests."""
    T = Cxx.shape[0]
    dx, du, lam = sol.dx, sol.du, sol.lam
    # nu_t (dynamics row t multiplier) = lam[t+1]; init row = lam[0]
    nu = lam[1:]
    # d/d dx_t: Cxx dx + Cxu du + gx - Aᵀν_t (t<T-1) + ν_{t-1} (t>0) + init
    st_x = _mv(Cxx, dx) + _mv(Cxu, du) + gx
    st_x = st_x.at[:-1].add(-_mv(jnp.swapaxes(A, -1, -2), nu))
    st_x = st_x.at[1:].add(nu)
    st_x = st_x.at[0].add(lam[0])
    st_u = _mv(jnp.swapaxes(Cxu, -1, -2), dx) + _mv(Cuu, du) + gu
    st_u = st_u.at[:-1].add(-_mv(jnp.swapaxes(B, -1, -2), nu))
    feas = dx[1:] - (_mv(A, dx[:-1]) + _mv(B, du[:-1]) + r)
    feas0 = dx[0] - dx0
    return st_x, st_u, feas, feas0
