"""Pallas TPU kernel: the ENTIRE trajectory-QP interior-point solve fused.

The scan-path trajqp.solve dispatches ~max_iter × (residuals + 2 Riccati
solves + step logic) as separate XLA ops; this kernel runs the complete
Mehrotra predictor-corrector IPM — residuals, box elimination, two Riccati
KKT solves per iteration (shared riccati_tiles from ops.riccati_pallas),
fraction-to-boundary steps, centering, best-iterate tracking — as ONE
Pallas program per (8, 128) batch tile in the batch-of-scalars layout
(same design as ops/al_fused_pallas; the whole-solver-kernel idea of
GATO/ReLU-QP applied to the reference's DenseQPFunction path,
qpth/solvers/pdipm/batch_LU.py).

Numerics identical to solvers.trajqp.solve (cross-validated in
tests/test_trajqp_fused.py). Select via TrajQPConfig.kernel="fused".
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diff_qp_mpc_tpu.ops.riccati_pallas import (
    LANE,
    SUB,
    TILE,
    riccati_tiles,
)

Array = jnp.ndarray


def _trajqp_kernel(T: int, nx: int, nu: int, u_lo, u_hi,
                   max_iter: int, reg: float, min_slack: float,
                   cxx_ref, cxu_ref, cuu_ref, cx_ref, cu_ref,
                   a_ref, b_ref, f_ref, x0_ref, xi_ref, ui_ref,
                   x_ref, u_ref, lam_ref, zh_ref, zl_ref, sh_ref, sl_ref,
                   res_ref):
    n_comp = 2 * T * nu

    def load(ref, t, rows, cols):
        return [[ref[0, t, i, j] for j in range(cols)] for i in range(rows)]

    def loadv(ref, t, rows):
        return [ref[0, t, i] for i in range(rows)]

    Cxx_l = [load(cxx_ref, t, nx, nx) for t in range(T)]
    Cxu_l = [load(cxu_ref, t, nx, nu) for t in range(T)]
    Cuu_l = [load(cuu_ref, t, nu, nu) for t in range(T)]
    cx_l = [loadv(cx_ref, t, nx) for t in range(T)]
    cu_l = [loadv(cu_ref, t, nu) for t in range(T)]
    A_l = [load(a_ref, t, nx, nx) for t in range(T - 1)]
    B_l = [load(b_ref, t, nx, nu) for t in range(T - 1)]
    f_l = [loadv(f_ref, t, nx) for t in range(T - 1)]
    x0 = [x0_ref[0, i] for i in range(nx)]
    zero = x0[0] * 0.0
    one = zero + 1.0
    big = zero + jnp.finfo(jnp.float32).max

    # ---- initialization (trajqp.solve:138-159) ----
    x = [[xi_ref[0, t, i] for i in range(nx)] for t in range(T)]
    u = [[jnp.clip(ui_ref[0, t, i], u_lo[i] + 1e-3, u_hi[i] - 1e-3)
          for i in range(nu)] for t in range(T)]
    lam = [[zero for _ in range(nx)] for _ in range(T)]
    s_hi = [[jnp.maximum(u_hi[i] - u[t][i], 0.1) for i in range(nu)]
            for t in range(T)]
    s_lo = [[jnp.maximum(u[t][i] - u_lo[i], 0.1) for i in range(nu)]
            for t in range(T)]
    z_hi = [[one for _ in range(nu)] for _ in range(T)]
    z_lo = [[one for _ in range(nu)] for _ in range(T)]

    def tup(nested):
        return tuple(tuple(row) for row in nested)

    def lst(nested):
        return [list(row) for row in nested]

    def residuals(x, u, lam, z_hi, z_lo, s_hi, s_lo):
        """Mirrors trajqp._stationarity + full_residuals."""
        r_x = [[cx_l[t][i] for i in range(nx)] for t in range(T)]
        r_u = [[cu_l[t][i] + z_hi[t][i] - z_lo[t][i] for i in range(nu)]
               for t in range(T)]
        for t in range(T):
            for i in range(nx):
                acc = r_x[t][i]
                for k in range(nx):
                    acc = acc + Cxx_l[t][i][k] * x[t][k]
                for k in range(nu):
                    acc = acc + Cxu_l[t][i][k] * u[t][k]
                r_x[t][i] = acc
            for i in range(nu):
                acc = r_u[t][i]
                for k in range(nx):
                    acc = acc + Cxu_l[t][k][i] * x[t][k]
                for k in range(nu):
                    acc = acc + Cuu_l[t][i][k] * u[t][k]
                r_u[t][i] = acc
        for t in range(T - 1):
            nu_d = lam[t + 1]
            for i in range(nx):
                acc = r_x[t][i]
                for k in range(nx):
                    acc = acc - A_l[t][k][i] * nu_d[k]
                r_x[t][i] = acc
                r_x[t + 1][i] = r_x[t + 1][i] + nu_d[i]
            for i in range(nu):
                acc = r_u[t][i]
                for k in range(nx):
                    acc = acc - B_l[t][k][i] * nu_d[k]
                r_u[t][i] = acc
        for i in range(nx):
            r_x[0][i] = r_x[0][i] + lam[0][i]
        r_dyn = []
        for t in range(T - 1):
            row = []
            for i in range(nx):
                acc = x[t + 1][i] - f_l[t][i]
                for k in range(nx):
                    acc = acc - A_l[t][i][k] * x[t][k]
                for k in range(nu):
                    acc = acc - B_l[t][i][k] * u[t][k]
                row.append(acc)
            r_dyn.append(row)
        r_init = [x[0][i] - x0[i] for i in range(nx)]
        r_p_hi = [[u[t][i] - u_hi[i] + s_hi[t][i] for i in range(nu)]
                  for t in range(T)]
        r_p_lo = [[u_lo[i] - u[t][i] + s_lo[t][i] for i in range(nu)]
                  for t in range(T)]
        r_s_hi = [[s_hi[t][i] * z_hi[t][i] for i in range(nu)]
                  for t in range(T)]
        r_s_lo = [[s_lo[t][i] * z_lo[t][i] for i in range(nu)]
                  for t in range(T)]
        return (r_x, r_u, r_dyn, r_init, r_p_hi, r_p_lo, r_s_hi, r_s_lo)

    def sq_sum(rows):
        s = zero
        for row in rows:
            for v in row:
                s = s + v * v
        return s

    def resid_norm(rs):
        r_x, r_u, r_dyn, r_init, r_p_hi, r_p_lo, r_s_hi, r_s_lo = rs
        mu = zero
        for t in range(T):
            for i in range(nu):
                mu = mu + r_s_hi[t][i] + r_s_lo[t][i]
        mu = mu / n_comp
        pri = (jnp.sqrt(sq_sum(r_dyn)) + jnp.sqrt(sq_sum([r_init]))
               + jnp.sqrt(sq_sum(r_p_hi)) + jnp.sqrt(sq_sum(r_p_lo)))
        dual = jnp.sqrt(sq_sum(r_x)) + jnp.sqrt(sq_sum(r_u))
        return pri + dual + n_comp * jnp.abs(mu), mu

    def kkt_step(z_hi, z_lo, s_hi, s_lo, rs, rc_s_hi=None, rc_s_lo=None):
        (r_x, r_u, r_dyn, r_init, r_p_hi, r_p_lo, r_s_hi, r_s_lo) = rs
        if rc_s_hi is not None:
            r_s_hi, r_s_lo = rc_s_hi, rc_s_lo
        Cuu_eff = []
        gu_rhs = []
        for t in range(T):
            Ct = [[Cuu_l[t][i][j] for j in range(nu)] for i in range(nu)]
            gt = []
            for i in range(nu):
                d = z_hi[t][i] / s_hi[t][i] + z_lo[t][i] / s_lo[t][i]
                Ct[i][i] = Ct[i][i] + d
                extra = ((z_hi[t][i] * r_p_hi[t][i] - r_s_hi[t][i])
                         / s_hi[t][i]
                         - (z_lo[t][i] * r_p_lo[t][i] - r_s_lo[t][i])
                         / s_lo[t][i])
                gt.append(r_u[t][i] + extra)
            Cuu_eff.append(Ct)
            gu_rhs.append(gt)
        neg_rdyn = [[-r_dyn[t][i] for i in range(nx)] for t in range(T - 1)]
        neg_rinit = [-r_init[i] for i in range(nx)]
        dx, du, dl = riccati_tiles(Cxx_l, Cxu_l, Cuu_eff, r_x, gu_rhs,
                                   A_l, B_l, neg_rdyn, neg_rinit,
                                   T, nx, nu, reg)
        ds_hi = [[-r_p_hi[t][i] - du[t][i] for i in range(nu)]
                 for t in range(T)]
        ds_lo = [[-r_p_lo[t][i] + du[t][i] for i in range(nu)]
                 for t in range(T)]
        dz_hi = [[-(r_s_hi[t][i] + z_hi[t][i] * ds_hi[t][i]) / s_hi[t][i]
                  for i in range(nu)] for t in range(T)]
        dz_lo = [[-(r_s_lo[t][i] + z_lo[t][i] * ds_lo[t][i]) / s_lo[t][i]
                  for i in range(nu)] for t in range(T)]
        return dx, du, dl, ds_hi, ds_lo, dz_hi, dz_lo

    def max_step(pairs):
        a = one
        for v_rows, dv_rows in pairs:
            for vr, dvr in zip(v_rows, dv_rows):
                for v, dv in zip(vr, dvr):
                    neg = dv < 0
                    step = jnp.where(neg, -v / jnp.where(neg, dv, -1.0), big)
                    a = jnp.minimum(a, step)
        return a

    def body(_, carry):
        (x_t, u_t, lam_t, zh_t, zl_t, sh_t, sl_t,
         b_tot, bx_t, bu_t, blam_t, bzh_t, bzl_t, bsh_t, bsl_t) = carry
        x, u = lst(x_t), lst(u_t)
        lam = lst(lam_t)
        z_hi, z_lo, s_hi, s_lo = lst(zh_t), lst(zl_t), lst(sh_t), lst(sl_t)
        rs = residuals(x, u, lam, z_hi, z_lo, s_hi, s_lo)
        total, mu = resid_norm(rs)

        better = total < b_tot
        pick = lambda nw, old: tuple(
            tuple(jnp.where(better, a, b) for a, b in zip(rn, ro))
            for rn, ro in zip(nw, old))
        b_tot_n = jnp.where(better, total, b_tot)
        bx_n, bu_n = pick(x, bx_t), pick(u, bu_t)
        blam_n = pick(lam, blam_t)
        bzh_n, bzl_n = pick(z_hi, bzh_t), pick(z_lo, bzl_t)
        bsh_n, bsl_n = pick(s_hi, bsh_t), pick(s_lo, bsl_t)

        # affine (predictor)
        dxa, dua, dla, dsha, dsla, dzha, dzla = kkt_step(
            z_hi, z_lo, s_hi, s_lo, rs)
        a_aff = max_step([(s_hi, dsha), (s_lo, dsla),
                          (z_hi, dzha), (z_lo, dzla)])
        mu_aff = zero
        for t in range(T):
            for i in range(nu):
                mu_aff = mu_aff \
                    + (s_hi[t][i] + a_aff * dsha[t][i]) \
                    * (z_hi[t][i] + a_aff * dzha[t][i]) \
                    + (s_lo[t][i] + a_aff * dsla[t][i]) \
                    * (z_lo[t][i] + a_aff * dzla[t][i])
        mu_aff = mu_aff / n_comp
        sigma = (mu_aff / jnp.maximum(mu, 1e-30)) ** 3
        smu = sigma * mu

        # centering-corrector: zero residuals except complementarity
        zrs = tuple(
            [[zero for _ in row] for row in group] if isinstance(group[0],
                                                                 list)
            else [zero for _ in group]
            for group in rs[:6])
        rc_s_hi = [[dsha[t][i] * dzha[t][i] - smu for i in range(nu)]
                   for t in range(T)]
        rc_s_lo = [[dsla[t][i] * dzla[t][i] - smu for i in range(nu)]
                   for t in range(T)]
        rs_c = zrs + (rc_s_hi, rc_s_lo)
        dxc, duc, dlc, dshc, dslc, dzhc, dzlc = kkt_step(
            z_hi, z_lo, s_hi, s_lo, rs_c)

        add = lambda A_, B_: [[a + b for a, b in zip(ra, rb)]
                              for ra, rb in zip(A_, B_)]
        dx, du, dl = add(dxa, dxc), add(dua, duc), add(dla, dlc)
        dsh, dsl = add(dsha, dshc), add(dsla, dslc)
        dzh, dzl = add(dzha, dzhc), add(dzla, dzlc)
        alpha = 0.99 * max_step([(s_hi, dsh), (s_lo, dsl),
                                 (z_hi, dzh), (z_lo, dzl)])

        step = lambda V, dV: tuple(
            tuple(v + alpha * d for v, d in zip(rv, rd))
            for rv, rd in zip(V, dV))
        clamp_step = lambda V, dV: tuple(
            tuple(jnp.maximum(v + alpha * d, min_slack)
                  for v, d in zip(rv, rd)) for rv, rd in zip(V, dV))
        return (step(x, dx), step(u, du), step(lam, dl),
                clamp_step(z_hi, dzh), clamp_step(z_lo, dzl),
                clamp_step(s_hi, dsh), clamp_step(s_lo, dsl),
                b_tot_n, bx_n, bu_n, blam_n, bzh_n, bzl_n, bsh_n, bsl_n)

    carry = (tup(x), tup(u), tup(lam), tup(z_hi), tup(z_lo), tup(s_hi),
             tup(s_lo), big, tup(x), tup(u), tup(lam), tup(z_hi),
             tup(z_lo), tup(s_hi), tup(s_lo))
    carry = jax.lax.fori_loop(0, max_iter, body, carry)
    (x_t, u_t, lam_t, zh_t, zl_t, sh_t, sl_t,
     b_tot, bx_t, bu_t, blam_t, bzh_t, bzl_t, bsh_t, bsl_t) = carry

    # final best-iterate comparison (trajqp.solve:262-264)
    x, u, lam = lst(x_t), lst(u_t), lst(lam_t)
    z_hi, z_lo, s_hi, s_lo = lst(zh_t), lst(zl_t), lst(sh_t), lst(sl_t)
    total, _ = resid_norm(residuals(x, u, lam, z_hi, z_lo, s_hi, s_lo))
    better = total < b_tot
    out_tot = jnp.minimum(total, b_tot)

    def sel(cur, best):
        return [[jnp.where(better, cur[t][i], best[t][i])
                 for i in range(len(cur[t]))] for t in range(len(cur))]

    x, u, lam = sel(x, lst(bx_t)), sel(u, lst(bu_t)), sel(lam, lst(blam_t))
    z_hi, z_lo = sel(z_hi, lst(bzh_t)), sel(z_lo, lst(bzl_t))
    s_hi, s_lo = sel(s_hi, lst(bsh_t)), sel(s_lo, lst(bsl_t))

    res_ref[0, 0] = out_tot
    for t in range(T):
        for i in range(nx):
            x_ref[0, t, i] = x[t][i]
            lam_ref[0, t, i] = lam[t][i]
        for i in range(nu):
            u_ref[0, t, i] = u[t][i]
            zh_ref[0, t, i] = z_hi[t][i]
            zl_ref[0, t, i] = z_lo[t][i]
            sh_ref[0, t, i] = s_hi[t][i]
            sl_ref[0, t, i] = s_lo[t][i]


@functools.partial(
    jax.jit,
    static_argnames=("u_lo", "u_hi", "max_iter", "reg", "min_slack",
                     "interpret"))
def fused_trajqp_solve(C, c, A, B, f, x0, x_init, u_init,
                       u_lo, u_hi, max_iter: int = 12, reg: float = 1e-9,
                       min_slack: float = 1e-8, interpret: bool = False):
    """Whole-solver fused trajectory-QP IPM.

    C: [Bb,T,n,n], c: [Bb,T,n], A: [Bb,T-1,nx,nx], B: [Bb,T-1,nx,nu],
    f: [Bb,T-1,nx], x0: [Bb,nx], x_init: [Bb,T,nx], u_init: [Bb,T,nu];
    u_lo/u_hi: static float tuples. Returns
    (x, u, lam, z_hi, z_lo, s_hi, s_lo, resids).
    """
    Bb, Tm1, nx, nu = B.shape
    T = Tm1 + 1
    n = nx + nu
    dt = C.dtype

    pad = (-Bb) % TILE
    if pad:
        padB = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], dt)], axis=0)
        C, c, A, B, f = padB(C), padB(c), padB(A), padB(B), padB(f)
        x0, x_init, u_init = padB(x0), padB(x_init), padB(u_init)
        # padded elements: identity cost keeps Quu SPD
        eye = jnp.eye(n, dtype=dt)
        C = C.at[Bb:].add(eye)
    Bp = Bb + pad
    G = Bp // TILE

    def to_tiles(a, inner):
        return jnp.moveaxis(a.reshape((G, SUB, LANE) + inner), (1, 2),
                            (-2, -1))

    def spec(inner):
        shape = (1,) + inner + (SUB, LANE)
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (i,) + (0,) * (nd - 1),
                            memory_space=pltpu.VMEM)

    Cxx, Cxu, Cuu = C[..., :nx, :nx], C[..., :nx, nx:], C[..., nx:, nx:]
    cx, cu = c[..., :nx], c[..., nx:]

    kernel = functools.partial(
        _trajqp_kernel, T, nx, nu, u_lo, u_hi, max_iter, float(reg),
        float(min_slack))

    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[spec((T, nx, nx)), spec((T, nx, nu)), spec((T, nu, nu)),
                  spec((T, nx)), spec((T, nu)), spec((T - 1, nx, nx)),
                  spec((T - 1, nx, nu)), spec((T - 1, nx)), spec((nx,)),
                  spec((T, nx)), spec((T, nu))],
        out_specs=(spec((T, nx)), spec((T, nu)), spec((T, nx)),
                   spec((T, nu)), spec((T, nu)), spec((T, nu)),
                   spec((T, nu)), spec((1,))),
        out_shape=(
            jax.ShapeDtypeStruct((G, T, nx, SUB, LANE), dt),
            jax.ShapeDtypeStruct((G, T, nu, SUB, LANE), dt),
            jax.ShapeDtypeStruct((G, T, nx, SUB, LANE), dt),
            jax.ShapeDtypeStruct((G, T, nu, SUB, LANE), dt),
            jax.ShapeDtypeStruct((G, T, nu, SUB, LANE), dt),
            jax.ShapeDtypeStruct((G, T, nu, SUB, LANE), dt),
            jax.ShapeDtypeStruct((G, T, nu, SUB, LANE), dt),
            jax.ShapeDtypeStruct((G, 1, SUB, LANE), dt),
        ),
        interpret=interpret,
    )(to_tiles(Cxx, (T, nx, nx)), to_tiles(Cxu, (T, nx, nu)),
      to_tiles(Cuu, (T, nu, nu)), to_tiles(cx, (T, nx)),
      to_tiles(cu, (T, nu)), to_tiles(A, (T - 1, nx, nx)),
      to_tiles(B, (T - 1, nx, nu)), to_tiles(f, (T - 1, nx)),
      to_tiles(x0, (nx,)), to_tiles(x_init, (T, nx)),
      to_tiles(u_init, (T, nu)))

    back = lambda a, inner: jnp.moveaxis(
        a, (-2, -1), (1, 2)).reshape((Bp,) + inner)[:Bb]
    return (back(outs[0], (T, nx)), back(outs[1], (T, nu)),
            back(outs[2], (T, nx)), back(outs[3], (T, nu)),
            back(outs[4], (T, nu)), back(outs[5], (T, nu)),
            back(outs[6], (T, nu)), back(outs[7], (1,))[:, 0])
