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

Applicability: models implementing ``step_parts`` (coordinate-wise step on
tuples of same-shaped arrays — pendulum, integrator, and anything whose
step is elementwise closed form). Stacking coordinates onto a minor axis
inside the kernel is forbidden: Mosaic pads the minor dim to the lane
width, blowing VMEM (observed 39 MB vs the 16 MB budget). Jacobians come
from nx+nu ``jax.jvp`` evaluations of step_parts inside the kernel —
exact, no finite differences.

Semantics match solvers.al_mpc: λ/ρ enter as warm-start inputs (zeros/ones
= the fresh-ALState DEQ-MPC training configuration; pass the carried
multipliers for receding-horizon / solution-warm-start use — see
solvers.al_mpc.solve_fused_stateful, which reproduces the scan path's full
ALState carry by driving this kernel one AL iteration at a time).
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
    tile_bt_factor_solve_fn,
)

Array = jnp.ndarray


def _al_kernel(model, T: int, nx: int, nu: int, u_lo, u_hi,
               al_iter: int, n_newton: int, n_ls: int, rho_factor: float,
               rho_max: float, reg: float, ls_unroll: bool,
               cd_ref, c_ref, x0_ref, xi_ref, ui_ref,
               lamdi_ref, lamhi_ref, lamli_ref, rhoi_ref,
               w_ref, lamd_ref, lamh_ref, laml_ref, res_ref):
    n = nx + nu

    x0 = [x0_ref[0, i] for i in range(nx)]

    # ---- state: w[t] = [x coords..., u coords...] tiles ----
    w = [[xi_ref[0, t, i] for i in range(nx)]
         + [ui_ref[0, t, i] for i in range(nu)] for t in range(T)]
    for i in range(nx):
        w[0][i] = x0[i]  # pin x0

    zero = x0[0] * 0.0
    # warm-start carry: λ/ρ arrive as inputs (zeros/ones = fresh-state
    # semantics, the original fixed initialization). This is the fused
    # analog of the scan path's ALState carry (solvers/al_mpc.py,
    # reference AL_mpc.py:250-252,314-318).
    lam_d = [[lamdi_ref[0, t, i] for i in range(nx)] for t in range(T - 1)]
    lam_h = [[lamhi_ref[0, t, i] for i in range(nu)] for t in range(T)]
    lam_l = [[lamli_ref[0, t, i] for i in range(nu)] for t in range(T)]
    rho = rhoi_ref[0, 0]

    Cd = [[cd_ref[0, t, i] for i in range(n)] for t in range(T)]
    cv = [[c_ref[0, t, i] for i in range(n)] for t in range(T)]

    def residuals(w):
        """r_dyn [T-1][nx] tiles, bound residuals [T][nu]."""
        r_dyn = []
        for t in range(T - 1):
            f = model.step_parts(tuple(w[t][:nx]), tuple(w[t][nx:]))
            r_dyn.append([w[t + 1][i] - f[i] for i in range(nx)])
        r_hi = [[w[t][nx + i] - u_hi[i] for i in range(nu)] for t in range(T)]
        r_lo = [[u_lo[i] - w[t][nx + i] for i in range(nu)] for t in range(T)]
        return r_dyn, r_hi, r_lo

    # state pytrees for fori_loop carries: nested TUPLES of tiles
    def tup(nested):
        return tuple(tuple(row) for row in nested)

    def lst(nested):
        return [list(row) for row in nested]

    def newton_body(_, carry):
        w_t, merit_cur, lam_d_t, lam_h_t, lam_l_t, rho = carry
        w = lst(w_t)
        lam_d_l, lam_h_l, lam_l_l = lst(lam_d_t), lst(lam_h_t), lst(lam_l_t)

        # ---- dynamics + jacobians (per-coordinate tiles; no stacking) ----
        As, Bs, r_dyn = [], [], []
        for t in range(T - 1):
            xp = tuple(w[t][:nx])
            up = tuple(w[t][nx:])
            f = model.step_parts(xp, up)
            r_dyn.append([w[t + 1][i] - f[i] for i in range(nx)])
            one = jnp.ones_like(w[t][0])
            zr = jnp.zeros_like(w[t][0])
            Acols = []
            for j in range(nx):
                dxp = tuple(one if i == j else zr for i in range(nx))
                _, col = jax.jvp(lambda xx: model.step_parts(xx, up),
                                 (xp,), (dxp,))
                Acols.append(col)
            Bcols = []
            for j in range(nu):
                dup = tuple(one if i == j else zr for i in range(nu))
                _, col = jax.jvp(lambda uu: model.step_parts(xp, uu),
                                 (up,), (dup,))
                Bcols.append(col)
            As.append([[Acols[j][i] for j in range(nx)] for i in range(nx)])
            Bs.append([[Bcols[j][i] for j in range(nu)] for i in range(nx)])

        r_hi = [[w[t][nx + i] - u_hi[i] for i in range(nu)] for t in range(T)]
        r_lo = [[u_lo[i] - w[t][nx + i] for i in range(nu)] for t in range(T)]
        m_hi = [[(r_hi[t][i] > 0).astype(r_hi[t][i].dtype)
                 for i in range(nu)] for t in range(T)]
        m_lo = [[(r_lo[t][i] > 0).astype(r_lo[t][i].dtype)
                 for i in range(nu)] for t in range(T)]

        # ---- merit gradient ----
        vd = [[lam_d_l[t][i] + rho * r_dyn[t][i] for i in range(nx)]
              for t in range(T - 1)]
        grad = [[Cd[t][i] * w[t][i] + cv[t][i] for i in range(n)]
                for t in range(T)]
        for t in range(T - 1):
            for i in range(nx):
                acc = grad[t][i]
                for k in range(nx):
                    acc = acc - As[t][k][i] * vd[t][k]
                grad[t][i] = acc
            for i in range(nu):
                acc = grad[t][nx + i]
                for k in range(nx):
                    acc = acc - Bs[t][k][i] * vd[t][k]
                grad[t][nx + i] = acc
            for i in range(nx):
                grad[t + 1][i] = grad[t + 1][i] + vd[t][i]
        for t in range(T):
            for i in range(nu):
                ch = jnp.maximum(r_hi[t][i], 0.0)
                cl = jnp.maximum(r_lo[t][i], 0.0)
                grad[t][nx + i] = grad[t][nx + i] \
                    + lam_h_l[t][i] + rho * ch - lam_l_l[t][i] - rho * cl

        # ---- GN Hessian blocks, built LAZILY inside the factor sweep so
        # each (n×n)-tile block dies right after it folds into the
        # Cholesky (peak-VMEM fix for large-n models; see
        # btsolve_pallas.tile_bt_factor_solve_fn) ----
        def D_fn(t):
            Dt = [[zero for _ in range(n)] for _ in range(n)]
            for i in range(n):
                Dt[i][i] = Cd[t][i]
            for i in range(nx):
                Dt[i][i] = Dt[i][i] + rho
            for i in range(nu):
                Dt[nx + i][nx + i] = Dt[nx + i][nx + i] \
                    + rho * (m_hi[t][i] + m_lo[t][i])
            if t < T - 1:
                for i in range(n):
                    for j in range(i + 1):
                        acc = zero
                        for k in range(nx):
                            gi = As[t][k][i] if i < nx else Bs[t][k][i - nx]
                            gj = As[t][k][j] if j < nx else Bs[t][k][j - nx]
                            acc = acc + gi * gj
                        Dt[i][j] = Dt[i][j] + rho * acc
                        if i != j:
                            Dt[j][i] = Dt[j][i] + rho * acc
            if t == 0:  # pin x0 block
                for i in range(nx):
                    for j in range(n):
                        Dt[i][j] = zero
                        Dt[j][i] = zero
                    Dt[i][i] = zero + 1.0
            return Dt

        def O_fn(t):
            Ot = [[zero for _ in range(n)] for _ in range(n)]
            for i in range(nx):
                for j in range(n):
                    if t == 0 and j < nx:
                        continue  # pinned x0 columns
                    g = As[t][i][j] if j < nx else Bs[t][i][j - nx]
                    Ot[i][j] = -rho * g
            return Ot

        # ---- pin x0 gradient ----
        for i in range(nx):
            grad[0][i] = zero

        # ---- Newton step ----
        d = tile_bt_factor_solve_fn(D_fn, O_fn, grad, T, n, reg)
        d = tup([[-d[t][i] for i in range(n)] for t in range(T)])

        # ---- line search (fori over candidates). Two exact savings vs the
        # naive per-candidate merit:
        # (1) the quadratic cost term of every candidate w + a·d is a
        #     polynomial q0 + q1·a + q2·a² in the step size — its
        #     coefficients are precomputed once per Newton step (T·n·5
        #     tile-ops per candidate → 4), valid because d[0][:nx] = 0
        #     exactly (pinned x0 rows/cols + zero gradient in the solve);
        # (2) the carry holds only (best merit, best step size) — selecting
        #     a full best_w candidate costs T·n jnp.where tiles per
        #     candidate; w + a*·d is reconstructed once afterwards. ----
        q0, q1, q2 = zero, zero, zero
        for t in range(T):
            for i in range(n):
                q0 = q0 + 0.5 * Cd[t][i] * w[t][i] * w[t][i] \
                    + cv[t][i] * w[t][i]
                q1 = q1 + (Cd[t][i] * w[t][i] + cv[t][i]) * d[t][i]
                q2 = q2 + 0.5 * Cd[t][i] * d[t][i] * d[t][i]

        def ls_body(k, ls_carry):
            best_m, best_a = ls_carry
            a = 2.0 ** (-k.astype(jnp.float32))
            wk = [[w[t][i] + a * d[t][i] for i in range(n)]
                  for t in range(T)]
            for i in range(nx):
                wk[0][i] = x0[i]
            mk = q0 + a * q1 + (a * a) * q2 \
                + _merit_constraints(wk, lam_d_t, lam_h_t, lam_l_t, rho)
            better = mk < best_m
            return jnp.where(better, mk, best_m), jnp.where(better, a, best_a)

        big = jnp.full_like(merit_cur, jnp.finfo(jnp.float32).max)
        if ls_unroll:
            # Unrolled candidate sweep: each candidate's merit evaluation is
            # independent (only the running min is a serial dependency), so
            # unrolling lets Mosaic overlap the long-latency transcendentals
            # of the dynamics evaluations across candidates instead of
            # serializing them through the fori_loop carry.
            best_m, best_a = big, jnp.zeros_like(merit_cur)
            for k in range(n_ls):
                best_m, best_a = ls_body(jnp.float32(k), (best_m, best_a))
        else:
            best_m, best_a = jax.lax.fori_loop(
                0, n_ls, ls_body, (big, jnp.zeros_like(merit_cur)))
        # accept only if the best candidate strictly improves the merit
        # (step size 0 reproduces w, pinned x0 included since w[0][:nx]=x0).
        # NaN guard (branch-free): when the f32 factorization breaks down
        # (ρ·JᵀJ condition > 1/eps_f32 — the round-2 cp2 fused-f32 NaN) the
        # direction d can be huge/inf and every candidate merit NaN; each
        # ls_body comparison already rejects NaN candidates individually
        # (NaN < best is false), and the `where` select below keeps the
        # incumbent w bit-exact instead of computing 0·inf = NaN.
        better_any = best_m < merit_cur
        a_sel = jnp.where(better_any, best_a, 0.0)
        w_new = tuple(tuple(
            jnp.where(better_any, w[t][i] + a_sel * d[t][i], w[t][i])
            for i in range(n)) for t in range(T))
        w_new = tuple(tuple(x0[i] if t == 0 and i < nx else w_new[t][i]
                            for i in range(n)) for t in range(T))
        merit_new = jnp.where(better_any, best_m, merit_cur)
        return (w_new, merit_new, lam_d_t, lam_h_t, lam_l_t, rho)

    def _merit_constraints(w, lam_d_t, lam_h_t, lam_l_t, rho):
        """AL dynamics + bound terms of the merit (everything except the
        quadratic cost, which the line search evaluates polynomially)."""
        r_dyn, r_hi, r_lo = residuals(w)
        m = zero
        for t in range(T - 1):
            for i in range(nx):
                m = m + lam_d_t[t][i] * r_dyn[t][i] \
                    + 0.5 * rho * r_dyn[t][i] * r_dyn[t][i]
        for t in range(T):
            for i in range(nu):
                ch = jnp.maximum(r_hi[t][i], 0.0)
                cl = jnp.maximum(r_lo[t][i], 0.0)
                m = m + lam_h_t[t][i] * r_hi[t][i] \
                    + lam_l_t[t][i] * r_lo[t][i] \
                    + 0.5 * rho * (ch * ch + cl * cl)
        return m

    def _merit(w_t, lam_d_t, lam_h_t, lam_l_t, rho):
        w = lst(w_t)
        m = _merit_constraints(w, lam_d_t, lam_h_t, lam_l_t, rho)
        for t in range(T):
            for i in range(n):
                m = m + 0.5 * Cd[t][i] * w[t][i] * w[t][i] + cv[t][i] * w[t][i]
        return m

    def al_body(_, carry):
        w_t, lam_d_t, lam_h_t, lam_l_t, rho = carry
        merit_cur = _merit(w_t, lam_d_t, lam_h_t, lam_l_t, rho)
        w_t, merit_cur, lam_d_t, lam_h_t, lam_l_t, rho = jax.lax.fori_loop(
            0, n_newton, newton_body,
            (w_t, merit_cur, lam_d_t, lam_h_t, lam_l_t, rho))
        # ---- AL outer update ----
        w = lst(w_t)
        r_dyn, r_hi, r_lo = residuals(w)
        lam_d_n = tuple(tuple(lam_d_t[t][i] + rho * r_dyn[t][i]
                              for i in range(nx)) for t in range(T - 1))
        lam_h_n = tuple(tuple(jnp.maximum(lam_h_t[t][i] + rho * r_hi[t][i], 0.0)
                              for i in range(nu)) for t in range(T))
        lam_l_n = tuple(tuple(jnp.maximum(lam_l_t[t][i] + rho * r_lo[t][i], 0.0)
                              for i in range(nu)) for t in range(T))
        rho = jnp.minimum(rho * rho_factor, rho_max)
        return (w_t, lam_d_n, lam_h_n, lam_l_n, rho)

    w_t, lam_d_t, lam_h_t, lam_l_t, rho = jax.lax.fori_loop(
        0, al_iter, al_body,
        (tup(w), tup(lam_d), tup(lam_h), tup(lam_l), rho))
    w = lst(w_t)
    lam_d, lam_h, lam_l = lst(lam_d_t), lst(lam_h_t), lst(lam_l_t)

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
                   reg: float = 1e-5, interpret: bool = False,
                   ls_unroll: bool = False,
                   lam_dyn: Array = None, lam_hi: Array = None,
                   lam_lo: Array = None, rho0: Array = None,
                   ) -> Tuple[Array, Array, Array, Array, Array]:
    """Whole-solver fused AL-MPC with explicit x/u (and optional λ/ρ)
    warm starts.

    Cd, c: [B, T, n]; x0: [B, nx]; x_init: [B, T, nx]; u_init: [B, T, nu];
    u_lo_arr/u_hi_arr: [nu] (static per call via closure conversion to
    floats). lam_dyn [B, T-1, nx], lam_hi/lam_lo [B, T, nu], rho0 [B]
    default to zeros/ones — the fresh-ALState semantics. Returns
    (xu [B,T,n], lam_dyn, lam_hi, lam_lo, res_norm [B]).
    """
    u_lo = tuple(float(v) for v in np.asarray(u_lo_arr))
    u_hi = tuple(float(v) for v in np.asarray(u_hi_arr))
    B, T, n = Cd.shape
    nx = x0.shape[-1]
    nu = n - nx
    dt = Cd.dtype
    if lam_dyn is None:
        lam_dyn = jnp.zeros((B, T - 1, nx), dt)
    if lam_hi is None:
        lam_hi = jnp.zeros((B, T, nu), dt)
    if lam_lo is None:
        lam_lo = jnp.zeros((B, T, nu), dt)
    if rho0 is None:
        rho0 = jnp.ones((B,), dt)
    rho0 = rho0.reshape(B).astype(dt)
    return _fused_al_solve_jit(model, Cd, c, x0, u_lo, u_hi, x_init, u_init,
                               lam_dyn, lam_hi, lam_lo, rho0,
                               al_iter, n_newton, n_ls, float(rho_factor),
                               float(rho_max), float(reg), interpret,
                               ls_unroll)


@functools.partial(
    jax.jit,
    static_argnames=("model", "u_lo", "u_hi", "al_iter", "n_newton", "n_ls",
                     "rho_factor", "rho_max", "reg", "interpret", "ls_unroll"))
def _fused_al_solve_jit(model, Cd, c, x0, u_lo, u_hi, x_init, u_init,
                        lam_dyn, lam_hi, lam_lo, rho0,
                        al_iter, n_newton, n_ls, rho_factor, rho_max, reg,
                        interpret, ls_unroll):
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
        lam_dyn, lam_hi, lam_lo = padB(lam_dyn), padB(lam_hi), padB(lam_lo)
        rho0 = padB(rho0)
        # padded elements: unit cost + unit ρ keep the Newton systems
        # well posed
        Cd = Cd.at[B:].add(1.0)
        rho0 = rho0.at[B:].add(1.0)
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
        al_iter, n_newton, n_ls, float(rho_factor), float(rho_max),
        float(reg), ls_unroll)

    w, lamd, lamh, laml, res = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[spec((T, n)), spec((T, n)), spec((nx,)),
                  spec((T, nx)), spec((T, nu)),
                  spec((T - 1, nx)), spec((T, nu)), spec((T, nu)),
                  spec((1,))],
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
      to_tiles(x_init, (T, nx)), to_tiles(u_init, (T, nu)),
      to_tiles(lam_dyn, (T - 1, nx)), to_tiles(lam_hi, (T, nu)),
      to_tiles(lam_lo, (T, nu)), to_tiles(rho0[:, None], (1,)))

    back = lambda a, inner: jnp.moveaxis(
        a, (-2, -1), (1, 2)).reshape((Bp,) + inner)[:B]
    return (back(w, (T, n)), back(lamd, (T - 1, nx)),
            back(lamh, (T, nu)), back(laml, (T, nu)),
            back(res, (1,))[:, 0])
