"""Pallas TPU kernel: the ENTIRE batched AL-MPC solve as one program.

The jit-of-scans AL solver executes ~1.8 ms/Newton-iteration at bsz=1024 on
v5e, dominated by inter-op overhead around many small fused ops. This
kernel fuses the complete solver — dynamics + Jacobians (via jax.jvp traced
*inside* the kernel), merit gradient, block-tridiagonal Gauss-Newton
Hessian assembly, fused Cholesky factor/solve (shared tile helpers from
ops.btsolve_pallas), the 20-candidate line search, and the λ/ρ outer
updates — into a single Pallas program per batch tile. This is the TPU
analog of GPU whole-solver kernels (GATO / ReLU-QP) in batch-of-scalars
form: one (8,128) tile of batch elements per grid step, everything in VMEM.

Applicability: models whose ``step`` lowers to elementwise jnp ops
(pendulum, integrator, cos/sin cartpole — anything without linear-algebra
calls inside the step). Jacobians come from nx+nu ``jax.jvp`` evaluations
of the step inside the kernel — exact, no finite differences.

Semantics match solvers.al_mpc with a fresh ALState (the DEQ-MPC training
configuration: reinitialized λ/ρ each call, explicit x/u warm starts).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diff_qp_mpc_tpu.ops.btsolve_pallas import (
    LANE,
    SUB,
    TILE,
    tile_bt_factor_solve,
)

Array = jnp.ndarray


def _al_kernel(model, T: int, nx: int, nu: int, u_lo, u_hi,
               al_iter: int, n_newton: int, n_ls: int, rho_factor: float,
               rho_max: float, reg: float,
               cd_ref, c_ref, x0_ref, xi_ref, ui_ref,
               w_ref, lamd_ref, lamh_ref, laml_ref, res_ref):
    n = nx + nu

    def stack(ts):
        return jnp.stack(ts, axis=-1)

    def unstack(a, m):
        return [a[..., i] for i in range(m)]

    x0 = [x0_ref[0, i] for i in range(nx)]

    # ---- state: w[t] = [x coords..., u coords...] tiles ----
    w = [[xi_ref[0, t, i] for i in range(nx)]
         + [ui_ref[0, t, i] for i in range(nu)] for t in range(T)]
    for i in range(nx):
        w[0][i] = x0[i]  # pin x0

    zero = x0[0] * 0.0
    lam_d = [[zero for _ in range(nx)] for _ in range(T - 1)]
    lam_h = [[zero for _ in range(nu)] for _ in range(T)]
    lam_l = [[zero for _ in range(nu)] for _ in range(T)]
    rho = zero + 1.0

    Cd = [[cd_ref[0, t, i] for i in range(n)] for t in range(T)]
    cv = [[c_ref[0, t, i] for i in range(n)] for t in range(T)]

    def step_t(wt):
        x = stack(wt[:nx])
        u = stack(wt[nx:])
        return model.step(x, u)  # [SUB, LANE, nx]

    def residuals(w):
        """r_dyn [T-1][nx] tiles, bound residuals [T][nu]."""
        r_dyn = []
        for t in range(T - 1):
            f = step_t(w[t])
            r_dyn.append([w[t + 1][i] - f[..., i] for i in range(nx)])
        r_hi = [[w[t][nx + i] - u_hi[i] for i in range(nu)] for t in range(T)]
        r_lo = [[u_lo[i] - w[t][nx + i] for i in range(nu)] for t in range(T)]
        return r_dyn, r_hi, r_lo

    def merit(w, rho):
        r_dyn, r_hi, r_lo = residuals(w)
        m = zero
        for t in range(T):
            for i in range(n):
                m = m + 0.5 * Cd[t][i] * w[t][i] * w[t][i] + cv[t][i] * w[t][i]
        for t in range(T - 1):
            for i in range(nx):
                m = m + lam_d[t][i] * r_dyn[t][i] \
                    + 0.5 * rho * r_dyn[t][i] * r_dyn[t][i]
        for t in range(T):
            for i in range(nu):
                ch = jnp.maximum(r_hi[t][i], 0.0)
                cl = jnp.maximum(r_lo[t][i], 0.0)
                m = m + lam_h[t][i] * r_hi[t][i] + lam_l[t][i] * r_lo[t][i] \
                    + 0.5 * rho * (ch * ch + cl * cl)
        return m

    alphas = [2.0 ** (-k) for k in range(n_ls)]

    for _ in range(al_iter):
        merit_cur = merit(w, rho)
        for _ in range(n_newton):
            # ---- dynamics + jacobians ----
            As, Bs, r_dyn = [], [], []
            for t in range(T - 1):
                x = stack(w[t][:nx])
                u = stack(w[t][nx:])
                f = model.step(x, u)
                r_dyn.append([w[t + 1][i] - f[..., i] for i in range(nx)])
                one = jnp.ones_like(w[t][0])
                zr = jnp.zeros_like(w[t][0])
                Acols = []
                for j in range(nx):
                    dx = jnp.stack([one if i == j else zr
                                    for i in range(nx)], axis=-1)
                    _, col = jax.jvp(lambda xx: model.step(xx, u), (x,), (dx,))
                    Acols.append(col)
                Bcols = []
                for j in range(nu):
                    du = jnp.stack([one if i == j else zr
                                    for i in range(nu)], axis=-1)
                    _, col = jax.jvp(lambda uu: model.step(x, uu), (u,), (du,))
                    Bcols.append(col)
                As.append([[Acols[j][..., i] for j in range(nx)]
                           for i in range(nx)])  # A[i][j] = dfi/dxj
                Bs.append([[Bcols[j][..., i] for j in range(nu)]
                           for i in range(nx)])

            r_hi = [[w[t][nx + i] - u_hi[i] for i in range(nu)]
                    for t in range(T)]
            r_lo = [[u_lo[i] - w[t][nx + i] for i in range(nu)]
                    for t in range(T)]
            m_hi = [[(r_hi[t][i] > 0).astype(r_hi[t][i].dtype)
                     for i in range(nu)] for t in range(T)]
            m_lo = [[(r_lo[t][i] > 0).astype(r_lo[t][i].dtype)
                     for i in range(nu)] for t in range(T)]

            # ---- merit gradient (ops/almerit formulas, tile form) ----
            # v_dyn = λ + ρ·r (equality residuals are never clamped)
            vd = [[lam_d[t][i] + rho * r_dyn[t][i] for i in range(nx)]
                  for t in range(T - 1)]
            grad = [[Cd[t][i] * w[t][i] + cv[t][i] for i in range(n)]
                    for t in range(T)]
            for t in range(T - 1):
                for i in range(nx):  # -Aᵀ v on x-part of w_t
                    acc = grad[t][i]
                    for k in range(nx):
                        acc = acc - As[t][k][i] * vd[t][k]
                    grad[t][i] = acc
                for i in range(nu):  # -Bᵀ v on u-part of w_t
                    acc = grad[t][nx + i]
                    for k in range(nx):
                        acc = acc - Bs[t][k][i] * vd[t][k]
                    grad[t][nx + i] = acc
                for i in range(nx):  # +v on x-part of w_{t+1}
                    grad[t + 1][i] = grad[t + 1][i] + vd[t][i]
            for t in range(T):
                for i in range(nu):
                    ch = jnp.maximum(r_hi[t][i], 0.0)
                    cl = jnp.maximum(r_lo[t][i], 0.0)
                    grad[t][nx + i] = grad[t][nx + i] \
                        + lam_h[t][i] + rho * ch \
                        - lam_l[t][i] - rho * cl

            # ---- GN Hessian blocks ----
            D = [[[zero for _ in range(n)] for _ in range(n)]
                 for _ in range(T)]
            for t in range(T):
                for i in range(n):
                    D[t][i][i] = Cd[t][i]
                for i in range(nx):  # identity from dyn/init rows
                    D[t][i][i] = D[t][i][i] + rho
                for i in range(nu):
                    D[t][nx + i][nx + i] = D[t][nx + i][nx + i] \
                        + rho * (m_hi[t][i] + m_lo[t][i])
            for t in range(T - 1):  # ρ·GᵀG at block t
                for i in range(n):
                    for j in range(i + 1):
                        acc = zero
                        for k in range(nx):
                            gi = As[t][k][i] if i < nx else Bs[t][k][i - nx]
                            gj = As[t][k][j] if j < nx else Bs[t][k][j - nx]
                            acc = acc + gi * gj
                        D[t][i][j] = D[t][i][j] + rho * acc
                        if i != j:
                            D[t][j][i] = D[t][j][i] + rho * acc
            O = [[[zero for _ in range(n)] for _ in range(n)]
                 for _ in range(T - 1)]
            for t in range(T - 1):
                for i in range(nx):
                    for j in range(n):
                        g = As[t][i][j] if j < nx else Bs[t][i][j - nx]
                        O[t][i][j] = -rho * g

            # ---- pin x0 block ----
            for i in range(nx):
                grad[0][i] = zero
                for j in range(n):
                    D[0][i][j] = zero
                    D[0][j][i] = zero
                D[0][i][i] = zero + 1.0
            for i in range(n):
                for j in range(nx):
                    O[0][i][j] = zero

            # ---- Newton step ----
            d = tile_bt_factor_solve(D, O, grad, T, n, reg)
            d = [[-d[t][i] for i in range(n)] for t in range(T)]

            # ---- line search ----
            best_m = None
            best_w = None
            for a in alphas:
                wk = [[w[t][i] + a * d[t][i] for i in range(n)]
                      for t in range(T)]
                for i in range(nx):
                    wk[0][i] = x0[i]
                mk = merit(wk, rho)
                if best_m is None:
                    best_m, best_w = mk, wk
                else:
                    better = mk < best_m
                    best_w = [[jnp.where(better, wk[t][i], best_w[t][i])
                               for i in range(n)] for t in range(T)]
                    best_m = jnp.where(better, mk, best_m)
            improved = best_m < merit_cur
            w = [[jnp.where(improved, best_w[t][i], w[t][i])
                  for i in range(n)] for t in range(T)]
            merit_cur = jnp.where(improved, best_m, merit_cur)

        # ---- AL outer update ----
        r_dyn, r_hi, r_lo = residuals(w)
        for t in range(T - 1):
            for i in range(nx):
                lam_d[t][i] = lam_d[t][i] + rho * r_dyn[t][i]
        for t in range(T):
            for i in range(nu):
                lam_h[t][i] = jnp.maximum(lam_h[t][i] + rho * r_hi[t][i], 0.0)
                lam_l[t][i] = jnp.maximum(lam_l[t][i] + rho * r_lo[t][i], 0.0)
        rho = jnp.minimum(rho * rho_factor, rho_max)

    # ---- outputs ----
    r_dyn, r_hi, r_lo = residuals(w)
    res2 = zero
    for t in range(T - 1):
        for i in range(nx):
            res2 = res2 + r_dyn[t][i] * r_dyn[t][i]
    for t in range(T):
        for i in range(nu):
            ch = jnp.maximum(r_hi[t][i], 0.0)
            cl = jnp.maximum(r_lo[t][i], 0.0)
            res2 = res2 + ch * ch + cl * cl
    res_ref[0, 0] = jnp.sqrt(res2)
    for t in range(T):
        for i in range(n):
            w_ref[0, t, i] = w[t][i]
    for t in range(T - 1):
        for i in range(nx):
            lamd_ref[0, t, i] = lam_d[t][i]
    for t in range(T):
        for i in range(nu):
            lamh_ref[0, t, i] = lam_h[t][i]
            laml_ref[0, t, i] = lam_l[t][i]


def fused_al_solve(model, Cd: Array, c: Array, x0: Array, u_lo_arr, u_hi_arr,
                   x_init: Array, u_init: Array,
                   al_iter: int = 2, n_newton: int = 4, n_ls: int = 20,
                   rho_factor: float = 10.0, rho_max: float = 1e4,
                   reg: float = 1e-5, interpret: bool = False
                   ) -> Tuple[Array, Array, Array, Array, Array]:
    """Whole-solver fused AL-MPC (fresh λ/ρ; explicit x/u warm starts).

    Cd, c: [B, T, n]; x0: [B, nx]; x_init: [B, T, nx]; u_init: [B, T, nu];
    u_lo_arr/u_hi_arr: [nu] (static per call via closure conversion to
    floats). Returns (xu [B,T,n], lam_dyn, lam_hi, lam_lo, res_norm [B]).
    """
    u_lo = tuple(float(v) for v in np.asarray(u_lo_arr))
    u_hi = tuple(float(v) for v in np.asarray(u_hi_arr))
    return _fused_al_solve_jit(model, Cd, c, x0, u_lo, u_hi, x_init, u_init,
                               al_iter, n_newton, n_ls, float(rho_factor),
                               float(rho_max), float(reg), interpret)


@functools.partial(
    jax.jit,
    static_argnames=("model", "u_lo", "u_hi", "al_iter", "n_newton", "n_ls",
                     "rho_factor", "rho_max", "reg", "interpret"))
def _fused_al_solve_jit(model, Cd, c, x0, u_lo, u_hi, x_init, u_init,
                        al_iter, n_newton, n_ls, rho_factor, rho_max, reg,
                        interpret):
    B, T, n = Cd.shape
    nx = x0.shape[-1]
    nu = n - nx
    dt = Cd.dtype

    pad = (-B) % TILE
    if pad:
        padB = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], dt)], axis=0)
        Cd, c, x0 = padB(Cd), padB(c), padB(x0)
        x_init, u_init = padB(x_init), padB(u_init)
        # padded elements: unit cost keeps the Newton systems well posed
        Cd = Cd.at[B:].add(1.0)
    Bp = B + pad
    G = Bp // TILE

    def to_tiles(a, inner):
        return jnp.moveaxis(a.reshape((G, SUB, LANE) + inner), (1, 2), (-2, -1))

    def spec(inner):
        shape = (1,) + inner + (SUB, LANE)
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (i,) + (0,) * (nd - 1),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _al_kernel, model, T, nx, nu, u_lo, u_hi,
        al_iter, n_newton, n_ls, float(rho_factor), float(rho_max), float(reg))

    w, lamd, lamh, laml, res = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[spec((T, n)), spec((T, n)), spec((nx,)),
                  spec((T, nx)), spec((T, nu))],
        out_specs=(spec((T, n)), spec((T - 1, nx)), spec((T, nu)),
                   spec((T, nu)), spec((1,))),
        out_shape=(
            jax.ShapeDtypeStruct((G, T, n, SUB, LANE), dt),
            jax.ShapeDtypeStruct((G, T - 1, nx, SUB, LANE), dt),
            jax.ShapeDtypeStruct((G, T, nu, SUB, LANE), dt),
            jax.ShapeDtypeStruct((G, T, nu, SUB, LANE), dt),
            jax.ShapeDtypeStruct((G, 1, SUB, LANE), dt),
        ),
        interpret=interpret,
    )(to_tiles(Cd, (T, n)), to_tiles(c, (T, n)), to_tiles(x0, (nx,)),
      to_tiles(x_init, (T, nx)), to_tiles(u_init, (T, nu)))

    back = lambda a, inner: jnp.moveaxis(
        a, (-2, -1), (1, 2)).reshape((Bp,) + inner)[:B]
    return (back(w, (T, n)), back(lamd, (T - 1, nx)),
            back(lamh, (T, nu)), back(laml, (T, nu)),
            back(res, (1,))[:, 0])
