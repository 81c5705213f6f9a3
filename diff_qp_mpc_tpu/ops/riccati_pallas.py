"""Pallas TPU kernel: fused batched Riccati LQR-KKT solve.

Same batch-of-scalars design as ops/btsolve_pallas (every matrix entry is
an (8,128) tile of batch elements; the backward recursion + forward
rollout are fully unrolled over the static (T, nx, nu) loop nest, all-VPU
elementwise math). Numerics identical to ops.riccati.lqr_kkt_solve.

This is the hot kernel under the SQP / interior-point trajectory QP path
(solvers/trajqp.py kkt_step — two Riccati solves per IPM iteration).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

SUB, LANE = 8, 128
TILE = SUB * LANE


def _mat(rows, cols, fill=None):
    return [[fill] * cols for _ in range(rows)]


def tile_matmul(Am, Bm, ra, ca, cb):
    out = _mat(ra, cb)
    for i in range(ra):
        for j in range(cb):
            s = Am[i][0] * Bm[0][j]
            for k in range(1, ca):
                s = s + Am[i][k] * Bm[k][j]
            out[i][j] = s
    return out


def tile_matvec(Am, v, ra, ca):
    out = [None] * ra
    for i in range(ra):
        s = Am[i][0] * v[0]
        for k in range(1, ca):
            s = s + Am[i][k] * v[k]
        out[i] = s
    return out


def tile_transpose(Am, ra, ca):
    return [[Am[i][j] for i in range(ra)] for j in range(ca)]


def tile_chol_sq(Dm, m):
    L = _mat(m, m)
    for i in range(m):
        for j in range(i + 1):
            s = Dm[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    return L


def tile_chol_solve_vec(L, v, m):
    y = [None] * m
    for i in range(m):
        s = v[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * m
    for i in reversed(range(m)):
        s = y[i]
        for k in range(i + 1, m):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def riccati_tiles(Cxx_l, Cxu_l, Cuu_l, gx_l, gu_l, A_l, B_l, r_l, dx0,
                  T, nx, nu, reg):
    """Riccati LQR-KKT solve on tile lists (shared by the standalone
    Riccati kernel and the fused trajQP IPM kernel).

    Cxx_l: [T][nx][nx] tiles etc.; A_l/B_l/r_l: [T-1] stages; dx0: [nx]
    tiles. Returns (dx [T][nx], du [T][nu], lam [T][nx]) tile lists."""
    matmul, matvec, transpose = tile_matmul, tile_matvec, tile_transpose
    chol, chol_solve_vec = tile_chol_sq, tile_chol_solve_vec

    # ---- backward recursion ----
    zero = gx_l[0][0] * 0.0
    P = _mat(nx, nx, None)
    p = [zero] * nx
    for i in range(nx):
        for j in range(nx):
            P[i][j] = zero

    Ks, ks, Ps, ps = [None] * T, [None] * T, [None] * T, [None] * T
    for t in reversed(range(T)):
        Cxx = Cxx_l[t]
        Cxu = Cxu_l[t]
        Cuu = Cuu_l[t]
        qx = list(gx_l[t])
        qu = list(gu_l[t])
        if t < T - 1:
            At, Bt, rt = A_l[t], B_l[t], r_l[t]
            PA = matmul(P, At, nx, nx, nx)
            PB = matmul(P, Bt, nx, nx, nu)
            m_vec = matvec(P, rt, nx, nx)
            for i in range(nx):
                m_vec[i] = m_vec[i] + p[i]
            AT = transpose(At, nx, nx)
            BT = transpose(Bt, nx, nu)
            Qxx = matmul(AT, PA, nx, nx, nx)
            Qxu = matmul(AT, PB, nx, nx, nu)
            Quu = matmul(BT, PB, nu, nx, nu)
            for i in range(nx):
                for j in range(nx):
                    Qxx[i][j] = Qxx[i][j] + Cxx[i][j]
                for j in range(nu):
                    Qxu[i][j] = Qxu[i][j] + Cxu[i][j]
            for i in range(nu):
                for j in range(nu):
                    Quu[i][j] = Quu[i][j] + Cuu[i][j]
            Am_qx = matvec(AT, m_vec, nx, nx)
            Bm_qu = matvec(BT, m_vec, nu, nx)
            for i in range(nx):
                qx[i] = qx[i] + Am_qx[i]
            for i in range(nu):
                qu[i] = qu[i] + Bm_qu[i]
        else:
            Qxx = [[Cxx[i][j] for j in range(nx)] for i in range(nx)]
            Qxu = [[Cxu[i][j] for j in range(nu)] for i in range(nx)]
            Quu = [[Cuu[i][j] for j in range(nu)] for i in range(nu)]
        for i in range(nu):
            Quu[i][i] = Quu[i][i] + reg
        Lc = chol(Quu, nu)
        # K = -Quu^{-1} Qxuᵀ  (columns = x indices), k = -Quu^{-1} qu
        Qux = transpose(Qxu, nx, nu)  # [nu][nx]
        K = _mat(nu, nx)
        for c in range(nx):
            col = chol_solve_vec(Lc, [Qux[i][c] for i in range(nu)], nu)
            for i in range(nu):
                K[i][c] = -col[i]
        kv = chol_solve_vec(Lc, qu, nu)
        kv = [-v for v in kv]
        # P_new = Qxx + Qxu K ; p_new = qx + Qxu k
        QK = matmul(Qxu, K, nx, nu, nx)
        P_new = _mat(nx, nx)
        for i in range(nx):
            for j in range(nx):
                P_new[i][j] = Qxx[i][j] + QK[i][j]
        # symmetrize
        for i in range(nx):
            for j in range(i):
                sym = 0.5 * (P_new[i][j] + P_new[j][i])
                P_new[i][j] = sym
                P_new[j][i] = sym
        Qk = matvec(Qxu, kv, nx, nu)
        p_new = [qx[i] + Qk[i] for i in range(nx)]
        P, p = P_new, p_new
        Ks[t], ks[t], Ps[t], ps[t] = K, kv, P, p

    # ---- forward rollout ----
    dx = list(dx0)
    dxs, dus, lams = [], [], []
    for t in range(T):
        du = tile_matvec(Ks[t], dx, nu, nx)
        for i in range(nu):
            du[i] = du[i] + ks[t][i]
        lam = tile_matvec(Ps[t], dx, nx, nx)
        dxs.append(list(dx))
        dus.append(du)
        lams.append([-(lam[i] + ps[t][i]) for i in range(nx)])
        if t < T - 1:
            At, Bt, rt = A_l[t], B_l[t], r_l[t]
            Adx = tile_matvec(At, dx, nx, nx)
            Bdu = tile_matvec(Bt, du, nx, nu)
            dx = [Adx[i] + Bdu[i] + rt[i] for i in range(nx)]
    return dxs, dus, lams


def _riccati_kernel(T: int, nx: int, nu: int, reg: float,
                    cxx_ref, cxu_ref, cuu_ref, gx_ref, gu_ref,
                    a_ref, b_ref, r_ref, dx0_ref,
                    dx_ref, du_ref, lam_ref):
    def load(ref, t, rows, cols):
        return [[ref[0, t, i, j] for j in range(cols)] for i in range(rows)]

    def loadv(ref, t, rows):
        return [ref[0, t, i] for i in range(rows)]

    Cxx_l = [load(cxx_ref, t, nx, nx) for t in range(T)]
    Cxu_l = [load(cxu_ref, t, nx, nu) for t in range(T)]
    Cuu_l = [load(cuu_ref, t, nu, nu) for t in range(T)]
    gx_l = [loadv(gx_ref, t, nx) for t in range(T)]
    gu_l = [loadv(gu_ref, t, nu) for t in range(T)]
    A_l = [load(a_ref, t, nx, nx) for t in range(T - 1)]
    B_l = [load(b_ref, t, nx, nu) for t in range(T - 1)]
    r_l = [loadv(r_ref, t, nx) for t in range(T - 1)]
    dx0 = [dx0_ref[0, i] for i in range(nx)]

    dxs, dus, lams = riccati_tiles(Cxx_l, Cxu_l, Cuu_l, gx_l, gu_l,
                                   A_l, B_l, r_l, dx0, T, nx, nu, reg)
    for t in range(T):
        for i in range(nx):
            dx_ref[0, t, i] = dxs[t][i]
            lam_ref[0, t, i] = lams[t][i]
        for i in range(nu):
            du_ref[0, t, i] = dus[t][i]


@functools.partial(jax.jit, static_argnames=("reg", "interpret"))
def batched_lqr_kkt_solve(Cxx, Cxu, Cuu, gx, gu, A, B, r, dx0,
                          reg: float = 0.0, interpret: bool = False):
    """Drop-in for ops.riccati.batched_lqr_kkt_solve (returns (dx, du, lam)
    — gains K/k stay internal). All inputs batched with leading axis B."""
    Bb, T, nx, nu = Cxu.shape
    dt = Cxx.dtype

    pad = (-Bb) % TILE
    if pad:
        padB = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], dt)], axis=0)
        Cxx, Cxu, Cuu = padB(Cxx), padB(Cxu), padB(Cuu)
        gx, gu, A, B, r, dx0 = (padB(gx), padB(gu), padB(A), padB(B),
                                padB(r), padB(dx0))
        # keep padded Cuu/Cxx nonsingular
        eye_u = jnp.eye(nu, dtype=dt)
        Cuu = Cuu.at[Bb:].add(eye_u)
    Bp = Bb + pad
    G = Bp // TILE

    def to_tiles(a, inner):
        return jnp.moveaxis(a.reshape((G, SUB, LANE) + inner), (1, 2), (-2, -1))

    args = (
        to_tiles(Cxx, (T, nx, nx)), to_tiles(Cxu, (T, nx, nu)),
        to_tiles(Cuu, (T, nu, nu)), to_tiles(gx, (T, nx)),
        to_tiles(gu, (T, nu)), to_tiles(A, (T - 1, nx, nx)),
        to_tiles(B, (T - 1, nx, nu)), to_tiles(r, (T - 1, nx)),
        to_tiles(dx0, (nx,)),
    )

    def spec(inner):
        shape = (1,) + inner + (SUB, LANE)
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (i,) + (0,) * (nd - 1),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_riccati_kernel, T, nx, nu, float(reg))
    dx, du, lam = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            spec((T, nx, nx)), spec((T, nx, nu)), spec((T, nu, nu)),
            spec((T, nx)), spec((T, nu)), spec((T - 1, nx, nx)),
            spec((T - 1, nx, nu)), spec((T - 1, nx)), spec((nx,)),
        ],
        out_specs=(spec((T, nx)), spec((T, nu)), spec((T, nx))),
        out_shape=(
            jax.ShapeDtypeStruct((G, T, nx, SUB, LANE), dt),
            jax.ShapeDtypeStruct((G, T, nu, SUB, LANE), dt),
            jax.ShapeDtypeStruct((G, T, nx, SUB, LANE), dt),
        ),
        interpret=interpret,
    )(*args)

    back = lambda a, inner: jnp.moveaxis(
        a, (-2, -1), (1, 2)).reshape((Bp,) + inner)[:Bb]
    return (back(dx, (T, nx)), back(du, (T, nu)), back(lam, (T, nx)))
