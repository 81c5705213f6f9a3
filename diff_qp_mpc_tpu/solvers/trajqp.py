"""Box-constrained trajectory QP via interior point + Riccati KKT solves.

Solves batches of

    min_{x,u}  Σₜ ½ wₜᵀ Cₜ wₜ + cₜᵀ wₜ          (w = (x, u))
    s.t.       x_{t+1} = Aₜ xₜ + Bₜ uₜ + fₜ,  x₀ = x0,  u_lo ≤ u ≤ u_hi

This is the problem the reference solves by assembling one dense QP over
the whole trajectory (qp_wrapper.py:638-679) and running the dense-KKT LU
PDIPM (DenseQPFunction, qp.py:187-271 + batch_LU.py). TPU-native redesign:
a Mehrotra predictor-corrector in which the box-inequality block is
eliminated analytically each iteration (slack/dual pairs fold into a
diagonal modification of Cuu and the u-gradient) and the remaining
equality-constrained Newton system is solved by the O(T) Riccati
factorization (ops.riccati) instead of O((T·n)³) dense LU. Fixed trip
count + best-iterate tracking keep it jit-clean (batch_LU.py:119-148
semantics).

Elimination algebra (per bound side, per (t, j)):
    Z ds + S dz = −r_s           (linearized complementarity)
    ±du + ds    = −r_p           (primal feasibility rows)
  ⇒ dz = (Z/S)·(±du) + (Z r_p − r_s)/S
so the u-stationarity row gains  diag(z_hi/s_hi + z_lo/s_lo)  and the
gradient gains  (Z r_p − r_s)/S  terms.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from diff_qp_mpc_tpu.core.types import Bounds
from diff_qp_mpc_tpu.ops import riccati

Array = jnp.ndarray
_PREC = jax.lax.Precision.HIGHEST


def _mv(M, v):
    return jnp.einsum("...ij,...j->...i", M, v, precision=_PREC)


@dataclasses.dataclass(frozen=True)
class TrajQPConfig:
    max_iter: int = 12
    reg: float = 1e-9  # Levenberg damping on Quu in the Riccati pass
    min_slack: float = 1e-8
    # Riccati kernel: "scan" | "pallas" | "pprefix" | "auto" (pallas on
    # TPU). "pprefix" is the O(log T)-depth associative-scan Riccati
    # (ops.riccati_pprefix) — the long-horizon kernel. "fused" runs the
    # ENTIRE IPM as one Pallas program (ops.trajqp_fused_pallas).
    kernel: str = "auto"
    interpret: bool = False  # Pallas interpreter mode (CPU testing)


def riccati_solver(kernel: str = "auto"):
    """(Cxx, Cxu, Cuu, gx, gu, A, B, r, dx0, reg) -> (dx, du, lam)."""
    if kernel == "auto":
        kernel = "pallas" if jax.default_backend() == "tpu" else "scan"
    if kernel == "pallas":
        from diff_qp_mpc_tpu.ops import riccati_pallas

        return lambda *a, reg: riccati_pallas.batched_lqr_kkt_solve(
            *a, reg=float(reg))
    if kernel == "pprefix":
        from diff_qp_mpc_tpu.ops import riccati_pprefix

        def pprefix_impl(*a, reg):
            sol = riccati_pprefix.batched_lqr_kkt_solve_pprefix(*a, reg)
            return sol.dx, sol.du, sol.lam

        return pprefix_impl

    def scan_impl(*a, reg):
        sol = riccati.batched_lqr_kkt_solve(*a, reg)
        return sol.dx, sol.du, sol.lam

    return scan_impl


class TrajQPSolution(NamedTuple):
    x: Array  # [bsz, T, nx]
    u: Array  # [bsz, T, nu]
    lam: Array  # [bsz, T, nx] costates (riccati convention)
    z_hi: Array  # [bsz, T, nu]
    z_lo: Array
    s_hi: Array
    s_lo: Array
    resids: Array  # [bsz]


class _CostBlocks(NamedTuple):
    Cxx: Array  # [bsz, T, nx, nx]
    Cxu: Array  # [bsz, T, nx, nu]
    Cuu: Array  # [bsz, T, nu, nu]
    cx: Array  # [bsz, T, nx]
    cu: Array  # [bsz, T, nu]


def split_cost(C: Array, c: Array, nx: int) -> _CostBlocks:
    """C: [bsz, T, n, n], c: [bsz, T, n] -> per-variable blocks."""
    return _CostBlocks(
        Cxx=C[..., :nx, :nx], Cxu=C[..., :nx, nx:], Cuu=C[..., nx:, nx:],
        cx=c[..., :nx], cu=c[..., nx:],
    )


def _stationarity(cb: _CostBlocks, x, u, lam, z_hi, z_lo, A, B):
    """(r_x, r_u) stationarity residuals (signs per ops.riccati
    kkt_residual: dyn-row-t multiplier is lam[t+1], init row lam[0])."""
    AT = jnp.swapaxes(A, -1, -2)
    BT = jnp.swapaxes(B, -1, -2)
    CxuT = jnp.swapaxes(cb.Cxu, -1, -2)
    nu_dyn = lam[:, 1:]
    r_x = _mv(cb.Cxx, x) + _mv(cb.Cxu, u) + cb.cx
    r_x = r_x.at[:, :-1].add(-_mv(AT, nu_dyn))
    r_x = r_x.at[:, 1:].add(nu_dyn)
    r_x = r_x.at[:, 0].add(lam[:, 0])
    r_u = _mv(CxuT, x) + _mv(cb.Cuu, u) + cb.cu + z_hi - z_lo
    r_u = r_u.at[:, :-1].add(-_mv(BT, nu_dyn))
    return r_x, r_u


def solve(C: Array, c: Array, A: Array, B: Array, f: Array, x0: Array,
          bounds: Bounds, cfg: TrajQPConfig = TrajQPConfig(),
          x_init: Array | None = None, u_init: Array | None = None
          ) -> TrajQPSolution:
    """Batched IPM solve. C: [bsz,T,n,n], c: [bsz,T,n], A: [bsz,T-1,nx,nx],
    B: [bsz,T-1,nx,nu], f: [bsz,T-1,nx], x0: [bsz,nx]."""
    bsz, Tm1, nx, nu = B.shape
    T = Tm1 + 1
    dt = C.dtype
    cb = split_cost(C, c, nx)
    # asarray first: bounds may carry STATIC python tuples (the fused
    # kernel path requires them — the box is baked as clip constants)
    u_hi = jnp.broadcast_to(jnp.asarray(bounds.u_hi), (bsz, T, nu)).astype(dt)
    u_lo = jnp.broadcast_to(jnp.asarray(bounds.u_lo), (bsz, T, nu)).astype(dt)

    if cfg.kernel == "fused":
        import numpy as _np

        from diff_qp_mpc_tpu.ops.trajqp_fused_pallas import fused_trajqp_solve

        u0 = (jnp.clip(u_init, u_lo + 1e-3, u_hi - 1e-3)
              if u_init is not None else 0.5 * (u_hi + u_lo))
        if x_init is None:
            def roll0(xt, inp):
                A_t, B_t, f_t, u_t = inp
                return _mv(A_t, xt) + _mv(B_t, u_t) + f_t, \
                    _mv(A_t, xt) + _mv(B_t, u_t) + f_t
            _, xs0 = jax.lax.scan(
                roll0, x0, (jnp.swapaxes(A, 0, 1), jnp.swapaxes(B, 0, 1),
                            jnp.swapaxes(f, 0, 1),
                            jnp.swapaxes(u0[:, :-1], 0, 1)))
            x_init = jnp.concatenate([x0[:, None],
                                      jnp.swapaxes(xs0, 0, 1)], axis=1)
        lo_t = tuple(float(v) for v in _np.asarray(bounds.u_lo))
        hi_t = tuple(float(v) for v in _np.asarray(bounds.u_hi))
        x_f, u_f, lam_f, zh, zl, sh, sl, resids = fused_trajqp_solve(
            C, c, A, B, f, x0, x_init, u0, lo_t, hi_t,
            max_iter=cfg.max_iter, reg=cfg.reg, min_slack=cfg.min_slack,
            interpret=cfg.interpret)
        return TrajQPSolution(x=x_f, u=u_f, lam=lam_f, z_hi=zh, z_lo=zl,
                              s_hi=sh, s_lo=sl, resids=resids)

    # --- initialization: interior (s, z) > 0; warm-startable (x, u) ---
    u = (jnp.clip(u_init, u_lo + 1e-3, u_hi - 1e-3)
         if u_init is not None else 0.5 * (u_hi + u_lo))
    if x_init is not None:
        x = x_init
    else:
        # affine rollout of u under the linearized dynamics
        def roll(xt, inp):
            A_t, B_t, f_t, u_t = inp
            xn = _mv(A_t, xt) + _mv(B_t, u_t) + f_t
            return xn, xn
        _, xs = jax.lax.scan(
            roll, x0,
            (jnp.swapaxes(A, 0, 1), jnp.swapaxes(B, 0, 1),
             jnp.swapaxes(f, 0, 1), jnp.swapaxes(u[:, :-1], 0, 1)),
        )
        x = jnp.concatenate([x0[:, None], jnp.swapaxes(xs, 0, 1)], axis=1)
    lam = jnp.zeros((bsz, T, nx), dt)
    s_hi = jnp.clip(u_hi - u, 0.1)
    s_lo = jnp.clip(u - u_lo, 0.1)
    z_hi = jnp.ones((bsz, T, nu), dt)
    z_lo = jnp.ones((bsz, T, nu), dt)
    n_comp = 2 * T * nu

    def full_residuals(x, u, lam, z_hi, z_lo, s_hi, s_lo):
        r_x, r_u = _stationarity(cb, x, u, lam, z_hi, z_lo, A, B)
        r_dyn = x[:, 1:] - (_mv(A, x[:, :-1]) + _mv(B, u[:, :-1]) + f)
        r_init = x[:, 0] - x0
        r_p_hi = u - u_hi + s_hi
        r_p_lo = u_lo - u + s_lo
        r_s_hi = s_hi * z_hi
        r_s_lo = s_lo * z_lo
        return r_x, r_u, r_dyn, r_init, r_p_hi, r_p_lo, r_s_hi, r_s_lo

    def resid_norm(rs):
        r_x, r_u, r_dyn, r_init, r_p_hi, r_p_lo, r_s_hi, r_s_lo = rs
        mu = (jnp.sum(r_s_hi, axis=(1, 2)) + jnp.sum(r_s_lo, axis=(1, 2))) / n_comp
        pri = (jnp.linalg.norm(r_dyn.reshape(bsz, -1), axis=1)
               + jnp.linalg.norm(r_init, axis=1)
               + jnp.linalg.norm(r_p_hi.reshape(bsz, -1), axis=1)
               + jnp.linalg.norm(r_p_lo.reshape(bsz, -1), axis=1))
        dual = (jnp.linalg.norm(r_x.reshape(bsz, -1), axis=1)
                + jnp.linalg.norm(r_u.reshape(bsz, -1), axis=1))
        return pri + dual + n_comp * jnp.abs(mu), mu

    solve_fn = riccati_solver(cfg.kernel)

    def kkt_step(z_hi, z_lo, s_hi, s_lo, r_x, r_u, r_dyn, r_init,
                 r_p_hi, r_p_lo, r_s_hi, r_s_lo):
        """Eliminate bound rows → Riccati solve → recover (ds, dz)."""
        d_hi = z_hi / s_hi
        d_lo = z_lo / s_lo
        gu_extra = (z_hi * r_p_hi - r_s_hi) / s_hi \
            - (z_lo * r_p_lo - r_s_lo) / s_lo
        Cuu_eff = cb.Cuu + jax.vmap(jax.vmap(jnp.diag))(d_hi + d_lo)
        dx, du, lam = solve_fn(
            cb.Cxx, cb.Cxu, Cuu_eff, r_x, r_u + gu_extra,
            A, B, -r_dyn, -r_init, reg=cfg.reg,
        )
        ds_hi = -r_p_hi - du
        ds_lo = -r_p_lo + du
        dz_hi = -(r_s_hi + z_hi * ds_hi) / s_hi
        dz_lo = -(r_s_lo + z_lo * ds_lo) / s_lo
        return dx, du, lam, ds_hi, ds_lo, dz_hi, dz_lo

    def max_step(v, dv):
        big = jnp.asarray(jnp.finfo(dt).max, dt)
        steps = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), big)
        return jnp.minimum(jnp.min(steps.reshape(bsz, -1), axis=1), 1.0)

    def body(carry, _):
        x, u, lam, z_hi, z_lo, s_hi, s_lo, best = carry
        rs = full_residuals(x, u, lam, z_hi, z_lo, s_hi, s_lo)
        r_x, r_u, r_dyn, r_init, r_p_hi, r_p_lo, r_s_hi, r_s_lo = rs
        total, mu = resid_norm(rs)

        # best-iterate tracking
        b_tot, bx, bu, blam, bzh, bzl, bsh, bsl = best
        better = total < b_tot
        sel = lambda nw, old: jnp.where(
            better.reshape((-1,) + (1,) * (nw.ndim - 1)), nw, old)
        best = (jnp.minimum(total, b_tot), sel(x, bx), sel(u, bu),
                sel(lam, blam), sel(z_hi, bzh), sel(z_lo, bzl),
                sel(s_hi, bsh), sel(s_lo, bsl))

        # affine (predictor)
        dx_a, du_a, dl_a, dsh_a, dsl_a, dzh_a, dzl_a = kkt_step(
            z_hi, z_lo, s_hi, s_lo, *rs)
        a_aff = jnp.minimum(
            jnp.minimum(max_step(s_hi, dsh_a), max_step(s_lo, dsl_a)),
            jnp.minimum(max_step(z_hi, dzh_a), max_step(z_lo, dzl_a)))
        a = a_aff.reshape(bsz, 1, 1)
        mu_aff = (jnp.sum((s_hi + a * dsh_a) * (z_hi + a * dzh_a), axis=(1, 2))
                  + jnp.sum((s_lo + a * dsl_a) * (z_lo + a * dzl_a), axis=(1, 2))
                  ) / n_comp
        sigma = (mu_aff / jnp.maximum(mu, 1e-300)) ** 3

        # centering-corrector (zero other residuals; batch_LU.py:169-179)
        smu = (sigma * mu)[:, None, None]
        rc_s_hi = dsh_a * dzh_a - smu
        rc_s_lo = dsl_a * dzl_a - smu
        zr = jnp.zeros_like
        dx_c, du_c, dl_c, dsh_c, dsl_c, dzh_c, dzl_c = kkt_step(
            z_hi, z_lo, s_hi, s_lo, zr(r_x), zr(r_u), zr(r_dyn), zr(r_init),
            zr(r_p_hi), zr(r_p_lo), rc_s_hi, rc_s_lo)

        dx, du, dl = dx_a + dx_c, du_a + du_c, dl_a + dl_c
        dsh, dsl = dsh_a + dsh_c, dsl_a + dsl_c
        dzh, dzl = dzh_a + dzh_c, dzl_a + dzl_c
        alpha = 0.99 * jnp.minimum(
            jnp.minimum(max_step(s_hi, dsh), max_step(s_lo, dsl)),
            jnp.minimum(max_step(z_hi, dzh), max_step(z_lo, dzl)))
        a = alpha.reshape(bsz, 1, 1)
        return (x + a * dx, u + a * du, lam + a * dl,
                jnp.maximum(z_hi + a * dzh, cfg.min_slack),
                jnp.maximum(z_lo + a * dzl, cfg.min_slack),
                jnp.maximum(s_hi + a * dsh, cfg.min_slack),
                jnp.maximum(s_lo + a * dsl, cfg.min_slack), best), None

    best0 = (jnp.full((bsz,), jnp.inf, dt), x, u, lam, z_hi, z_lo, s_hi, s_lo)
    carry0 = (x, u, lam, z_hi, z_lo, s_hi, s_lo, best0)
    (x, u, lam, z_hi, z_lo, s_hi, s_lo, best), _ = jax.lax.scan(
        body, carry0, None, length=cfg.max_iter)

    total, _ = resid_norm(full_residuals(x, u, lam, z_hi, z_lo, s_hi, s_lo))
    b_tot, bx, bu, blam, bzh, bzl, bsh, bsl = best
    better = total < b_tot
    sel = lambda nw, old: jnp.where(
        better.reshape((-1,) + (1,) * (nw.ndim - 1)), nw, old)
    return TrajQPSolution(
        x=sel(x, bx), u=sel(u, bu), lam=sel(lam, blam),
        z_hi=sel(z_hi, bzh), z_lo=sel(z_lo, bzl),
        s_hi=sel(s_hi, bsh), s_lo=sel(s_lo, bsl),
        resids=jnp.minimum(total, b_tot),
    )


# ---------------------------------------------------------------------------
# Differentiable layer: gradients w.r.t. (C, c, x0) — the parameters the
# MPC learning stack differentiates (Tracking_MPC supplies cost only;
# qp.py:238-270 backward math specialized to the trajectory structure).
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(7,))
def traj_qp_layer(C, c, A, B, f, x0, bounds, cfg: TrajQPConfig = TrajQPConfig()):
    sol = solve(C, c, A, B, f, x0, bounds, cfg)
    return jnp.concatenate([sol.x, sol.u], axis=-1)


def _fwd(C, c, A, B, f, x0, bounds, cfg):
    sol = solve(C, c, A, B, f, x0, bounds, cfg)
    return (jnp.concatenate([sol.x, sol.u], axis=-1),
            (C, c, A, B, f, x0, bounds, sol))


def _bwd(cfg, saved, dl_dw):
    C, c, A, B, f, x0, bounds, sol = saved
    bsz, Tm1, nx, nu = B.shape
    T = Tm1 + 1
    cb = split_cost(C, c, nx)
    # one extra KKT solve with dl/dw as stationarity rhs and clamped
    # D = z/s (qp.py:149 clamp semantics)
    z_hi = jnp.clip(sol.z_hi, 1e-8)
    z_lo = jnp.clip(sol.z_lo, 1e-8)
    s_hi = jnp.clip(sol.s_hi, 1e-8)
    s_lo = jnp.clip(sol.s_lo, 1e-8)
    d = z_hi / s_hi + z_lo / s_lo
    Cuu_eff = cb.Cuu + jax.vmap(jax.vmap(jnp.diag))(d)
    rdx, rdu, rlam = riccati_solver(cfg.kernel)(
        cb.Cxx, cb.Cxu, Cuu_eff, dl_dw[..., :nx], dl_dw[..., nx:],
        A, B, jnp.zeros_like(f), jnp.zeros((bsz, nx), C.dtype), reg=cfg.reg,
    )
    # lqr_kkt_solve with gradient rhs g̃ solves C̃v + Eᵀλ = −g̃, which is
    # exactly the OptNet backward system K[dz; dν] = −[∂L/∂z; 0]
    dw = jnp.concatenate([rdx, rdu], axis=-1)  # dz in OptNet notation
    w = jnp.concatenate([sol.x, sol.u], axis=-1)
    # dC = ½(dw wᵀ + w dwᵀ) per time block; dc = dw (qp.py:174,158)
    dC = 0.5 * (jnp.einsum("bti,btj->btij", dw, w, precision=_PREC)
                + jnp.einsum("bti,btj->btij", w, dw, precision=_PREC))
    dc = dw
    # dx0 = −dν_init (the db rule, qp.py:167 — init row multiplier is lam[0])
    dx0 = -rlam[:, 0]
    zeros = lambda v: jax.tree.map(jnp.zeros_like, v)
    return dC, dc, zeros(A), zeros(B), zeros(f), dx0, zeros(bounds)


traj_qp_layer.defvjp(_fwd, _bwd)


# Static-bounds variant for the FUSED whole-solver kernel: the kernel
# bakes the box as compile-time clip constants (fused_trajqp_solve is
# jitted with u_lo/u_hi in static_argnames), so bounds must stay a python
# constant THROUGH the custom_vjp boundary — the array-input layer above
# turns every pytree leaf (even python floats) into tracers when
# differentiated, which crashed `--solver_type ip --fused` training at
# the pretrain→deqmpc transition in every run through r4.
@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def traj_qp_layer_static(C, c, A, B, f, x0, bounds, cfg: TrajQPConfig):
    sol = solve(C, c, A, B, f, x0, bounds, cfg)
    return jnp.concatenate([sol.x, sol.u], axis=-1)


def _fwd_static(C, c, A, B, f, x0, bounds, cfg):
    sol = solve(C, c, A, B, f, x0, bounds, cfg)
    return (jnp.concatenate([sol.x, sol.u], axis=-1),
            (C, c, A, B, f, x0, bounds, sol))


def _bwd_static(bounds, cfg, saved, dl_dw):
    out = _bwd(cfg, saved, dl_dw)
    return out[:-1]  # drop the bounds cotangent (nondiff)


traj_qp_layer_static.defvjp(_fwd_static, _bwd_static)


# ---------------------------------------------------------------------------
# Elastic (SL1QP) trajectory QP: l1-penalty slack pairs on the dynamics
# rows, solved structurally — the box block eliminates as above and the
# elastic pairs (v, w ≥ 0, cost μ each, duals z_v, z_w) eliminate into a
# per-stage diagonal relaxation Θₜ = v/z_v + w/z_w of the dynamics rows,
# handled by the elastic Riccati recursion (ops.riccati theta support).
# This replaces the reference's dense sl1qpify expansion
# (sl1qp_mpc.py:703-752) with an O(T) solve. The init row stays hard
# (consistent with the x₀-pinned formulation).
# ---------------------------------------------------------------------------


class ElasticTrajQPSolution(NamedTuple):
    x: Array
    u: Array
    lam: Array
    v: Array  # [bsz, T-1, nx] positive-violation slacks
    w_s: Array  # [bsz, T-1, nx] negative-violation slacks
    slack_l1: Array  # [bsz] Σ(v + w) — total constraint relaxation
    resids: Array
    # final duals/slacks, saved for the elastic layer's implicit backward
    z_hi: Array
    z_lo: Array
    s_hi: Array
    s_lo: Array
    zv: Array
    zw: Array


def solve_elastic(C: Array, c: Array, A: Array, B: Array, f: Array,
                  x0: Array, bounds: Bounds, mu: float,
                  cfg: TrajQPConfig = TrajQPConfig(),
                  x_init: Array | None = None, u_init: Array | None = None
                  ) -> ElasticTrajQPSolution:
    """Batched elastic IPM solve (same inputs as ``solve`` + penalty μ)."""
    bsz, Tm1, nx, nu = B.shape
    T = Tm1 + 1
    dt = C.dtype
    cb = split_cost(C, c, nx)
    # asarray first: bounds may carry STATIC python tuples (the fused
    # kernel path requires them — the box is baked as clip constants)
    u_hi = jnp.broadcast_to(jnp.asarray(bounds.u_hi), (bsz, T, nu)).astype(dt)
    u_lo = jnp.broadcast_to(jnp.asarray(bounds.u_lo), (bsz, T, nu)).astype(dt)

    u = (jnp.clip(u_init, u_lo + 1e-3, u_hi - 1e-3)
         if u_init is not None else 0.5 * (u_hi + u_lo))
    if x_init is not None:
        x = x_init
    else:
        def roll(xt, inp):
            A_t, B_t, f_t, u_t = inp
            xn = _mv(A_t, xt) + _mv(B_t, u_t) + f_t
            return xn, xn
        _, xs = jax.lax.scan(
            roll, x0, (jnp.swapaxes(A, 0, 1), jnp.swapaxes(B, 0, 1),
                       jnp.swapaxes(f, 0, 1), jnp.swapaxes(u[:, :-1], 0, 1)))
        x = jnp.concatenate([x0[:, None], jnp.swapaxes(xs, 0, 1)], axis=1)
    lam = jnp.zeros((bsz, T, nx), dt)
    s_hi = jnp.clip(u_hi - u, 0.1)
    s_lo = jnp.clip(u - u_lo, 0.1)
    z_hi = jnp.ones((bsz, T, nu), dt)
    z_lo = jnp.ones((bsz, T, nu), dt)
    ev = jnp.full((bsz, Tm1, nx), 0.1, dt)
    ew = jnp.full((bsz, Tm1, nx), 0.1, dt)
    zv = jnp.full((bsz, Tm1, nx), mu, dt)
    zw = jnp.full((bsz, Tm1, nx), mu, dt)
    n_comp = 2 * T * nu + 2 * Tm1 * nx
    solve_fn = riccati.batched_lqr_kkt_solve_elastic

    def residuals(x, u, lam, z_hi, z_lo, s_hi, s_lo, ev, ew, zv, zw):
        r_x, r_u = _stationarity(cb, x, u, lam, z_hi, z_lo, A, B)
        nu_dyn = lam[:, 1:]
        e_dyn = x[:, 1:] - (_mv(A, x[:, :-1]) + _mv(B, u[:, :-1]) + f)
        r_el = e_dyn - ev + ew
        r_init = x[:, 0] - x0
        r_sv = mu - nu_dyn - zv
        r_sw = mu + nu_dyn - zw
        return (r_x, r_u, r_el, r_init, u - u_hi + s_hi, u_lo - u + s_lo,
                s_hi * z_hi, s_lo * z_lo, r_sv, r_sw, ev * zv, ew * zw)

    def max_step(v_, dv):
        big = jnp.asarray(jnp.finfo(dt).max, dt)
        steps = jnp.where(dv < 0, -v_ / jnp.where(dv < 0, dv, -1.0), big)
        return jnp.minimum(jnp.min(steps.reshape(bsz, -1), axis=1), 1.0)

    def kkt_step(state, rs, corr_cv=None, corr_cw=None):
        (x, u, lam, z_hi, z_lo, s_hi, s_lo, ev, ew, zv, zw) = state
        (r_x, r_u, r_el, r_init, r_p_hi, r_p_lo, r_s_hi, r_s_lo,
         r_sv, r_sw, r_cv, r_cw) = rs
        if corr_cv is not None:
            r_cv, r_cw = corr_cv, corr_cw
        d_box = z_hi / s_hi + z_lo / s_lo
        gu_extra = (z_hi * r_p_hi - r_s_hi) / s_hi \
            - (z_lo * r_p_lo - r_s_lo) / s_lo
        Cuu_eff = cb.Cuu + jax.vmap(jax.vmap(jnp.diag))(d_box)
        theta = ev / zv + ew / zw
        # dynamics-row rhs after elastic elimination (solver convention:
        # E dw − Θ dν = r_arg)
        r_arg = -r_el + (-r_cv - ev * r_sv) / zv - (-r_cw - ew * r_sw) / zw
        sol = solve_fn(
            cb.Cxx, cb.Cxu, Cuu_eff, r_x, r_u + gu_extra,
            A, B, r_arg, -r_init, cfg.reg, theta)
        dx, du, dlam = sol.dx, sol.du, sol.lam
        dnu = dlam[:, 1:]
        dzv = r_sv - dnu
        dzw = r_sw + dnu
        dev = (-r_cv - ev * dzv) / zv
        dew = (-r_cw - ew * dzw) / zw
        ds_hi = -r_p_hi - du
        ds_lo = -r_p_lo + du
        dz_hi = -(r_s_hi + z_hi * ds_hi) / s_hi
        dz_lo = -(r_s_lo + z_lo * ds_lo) / s_lo
        return (dx, du, dlam, dz_hi, dz_lo, ds_hi, ds_lo, dev, dew, dzv, dzw)

    def body(carry, _):
        state = carry
        (x, u, lam, z_hi, z_lo, s_hi, s_lo, ev, ew, zv, zw) = state
        rs = residuals(*state)
        mu_bar = (jnp.sum(rs[6], axis=(1, 2)) + jnp.sum(rs[7], axis=(1, 2))
                  + jnp.sum(rs[10], axis=(1, 2)) + jnp.sum(rs[11], axis=(1, 2))
                  ) / n_comp

        d_aff = kkt_step(state, rs)
        pairs = [(s_hi, d_aff[5]), (s_lo, d_aff[6]), (z_hi, d_aff[3]),
                 (z_lo, d_aff[4]), (ev, d_aff[7]), (ew, d_aff[8]),
                 (zv, d_aff[9]), (zw, d_aff[10])]
        a_aff = jnp.ones((bsz,), dt)
        for v_, dv in pairs:
            a_aff = jnp.minimum(a_aff, max_step(v_, dv))
        a = a_aff.reshape(bsz, 1, 1)
        mu_aff = (jnp.sum((s_hi + a * d_aff[5]) * (z_hi + a * d_aff[3]), axis=(1, 2))
                  + jnp.sum((s_lo + a * d_aff[6]) * (z_lo + a * d_aff[4]), axis=(1, 2))
                  + jnp.sum((ev + a * d_aff[7]) * (zv + a * d_aff[9]), axis=(1, 2))
                  + jnp.sum((ew + a * d_aff[8]) * (zw + a * d_aff[10]), axis=(1, 2))
                  ) / n_comp
        sigma = (mu_aff / jnp.maximum(mu_bar, 1e-300)) ** 3
        smu = (sigma * mu_bar)[:, None, None]

        rs_corr = list(rs)
        rs_corr[6] = rs[6] + d_aff[5] * d_aff[3] - smu
        rs_corr[7] = rs[7] + d_aff[6] * d_aff[4] - smu
        corr_cv = rs[10] + d_aff[7] * d_aff[9] - smu
        corr_cw = rs[11] + d_aff[8] * d_aff[10] - smu
        d = kkt_step(state, tuple(rs_corr), corr_cv, corr_cw)

        alpha = jnp.ones((bsz,), dt)
        pairs = [(s_hi, d[5]), (s_lo, d[6]), (z_hi, d[3]), (z_lo, d[4]),
                 (ev, d[7]), (ew, d[8]), (zv, d[9]), (zw, d[10])]
        for v_, dv in pairs:
            alpha = jnp.minimum(alpha, max_step(v_, dv))
        a = (0.99 * alpha).reshape(bsz, 1, 1)
        ms = cfg.min_slack
        new_state = (
            x + a * d[0], u + a * d[1], lam + a * d[2],
            jnp.maximum(z_hi + a * d[3], ms), jnp.maximum(z_lo + a * d[4], ms),
            jnp.maximum(s_hi + a * d[5], ms), jnp.maximum(s_lo + a * d[6], ms),
            jnp.maximum(ev + a * d[7], ms), jnp.maximum(ew + a * d[8], ms),
            jnp.maximum(zv + a * d[9], ms), jnp.maximum(zw + a * d[10], ms))
        return new_state, None

    state0 = (x, u, lam, z_hi, z_lo, s_hi, s_lo, ev, ew, zv, zw)
    state, _ = jax.lax.scan(body, state0, None, length=cfg.max_iter)
    (x, u, lam, z_hi, z_lo, s_hi, s_lo, ev, ew, zv, zw) = state
    rs = residuals(*state)
    total = sum(jnp.linalg.norm(r.reshape(bsz, -1), axis=1) for r in rs[:4])
    return ElasticTrajQPSolution(
        x=x, u=u, lam=lam, v=ev, w_s=ew,
        slack_l1=jnp.sum(ev + ew, axis=(1, 2)), resids=total,
        z_hi=z_hi, z_lo=z_lo, s_hi=s_hi, s_lo=s_lo, zv=zv, zw=zw)


# ---------------------------------------------------------------------------
# Differentiable elastic layer — the reference carries gradients through its
# final elastic QP via QPFunction.backward (qpth/sl1qp_mpc.py:301-331 →
# qp.py:128-183). Structured equivalent: one extra *elastic* Riccati KKT
# solve with ∂L/∂w as the stationarity rhs, box duals clamped into D and
# elastic duals clamped into the dynamics-row relaxation Θ, then the OptNet
# outer-product gradient assembly for (C, c, x0).
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def elastic_traj_qp_layer(C, c, A, B, f, x0, bounds, mu: float,
                          cfg: TrajQPConfig = TrajQPConfig(),
                          x_init=None, u_init=None):
    sol = solve_elastic(C, c, A, B, f, x0, bounds, mu, cfg, x_init, u_init)
    return jnp.concatenate([sol.x, sol.u], axis=-1)


def _el_fwd(C, c, A, B, f, x0, bounds, mu, cfg, x_init=None, u_init=None):
    sol = solve_elastic(C, c, A, B, f, x0, bounds, mu, cfg, x_init, u_init)
    return (jnp.concatenate([sol.x, sol.u], axis=-1),
            (C, A, B, x0, bounds, x_init, u_init, sol))


def _el_bwd(mu, cfg, saved, dl_dw):
    C, A, B, x0, bounds, x_init, u_init, sol = saved
    bsz, Tm1, nx, nu = B.shape
    cb = split_cost(C, jnp.zeros_like(dl_dw), nx)
    clip = lambda a: jnp.clip(a, 1e-8)
    d = clip(sol.z_hi) / clip(sol.s_hi) + clip(sol.z_lo) / clip(sol.s_lo)
    Cuu_eff = cb.Cuu + jax.vmap(jax.vmap(jnp.diag))(d)
    theta = clip(sol.v) / clip(sol.zv) + clip(sol.w_s) / clip(sol.zw)
    out = riccati.batched_lqr_kkt_solve_elastic(
        cb.Cxx, cb.Cxu, Cuu_eff, dl_dw[..., :nx], dl_dw[..., nx:],
        A, B, jnp.zeros((bsz, Tm1, nx), C.dtype),
        jnp.zeros((bsz, nx), C.dtype), cfg.reg, theta)
    dw = jnp.concatenate([out.dx, out.du], axis=-1)
    w = jnp.concatenate([sol.x, sol.u], axis=-1)
    dC = 0.5 * (jnp.einsum("bti,btj->btij", dw, w, precision=_PREC)
                + jnp.einsum("bti,btj->btij", w, dw, precision=_PREC))
    dc = dw
    dx0 = -out.lam[:, 0]
    zeros = lambda v: None if v is None else jax.tree.map(jnp.zeros_like, v)
    return (dC, dc, jnp.zeros_like(A), jnp.zeros_like(B),
            jnp.zeros((bsz, Tm1, nx), C.dtype), dx0,
            zeros(bounds), zeros(x_init), zeros(u_init))


elastic_traj_qp_layer.defvjp(_el_fwd, _el_bwd)
