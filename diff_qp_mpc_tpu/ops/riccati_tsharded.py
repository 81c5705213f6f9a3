"""Horizon-sharded (T-axis) Riccati LQR-KKT solve across a device mesh.

The last unexploited parallel axis (SURVEY.md §5): the reference solves the
trajectory KKT system dense on one GPU (qpth/qp_wrapper.py:657-679,
O((Tn)^3) LU); ops.riccati does the structure-exploiting O(T) scan on one
chip; ops.riccati_pprefix does the O(log T)-depth associative scan on one
chip. This module distributes the *horizon itself* over the mesh, so a
single very long trajectory (or a modest batch of them) can exceed one
chip's memory/FLOPs and scale over ICI.

Design — a distributed scan, not a halo exchange. The conditional value
elements of ops.riccati_pprefix form a monoid under min-convolution
(`_combine`), so the backward value recursion is a *suffix scan* over that
monoid and the closed-loop affine rollout is a *prefix scan* over affine
maps. A scan over a sharded axis decomposes into the classic three-phase
Blelloch pattern:

  1. local: each chip reduces/scans its own T/D chunk of stages
     (associative_scan on-chip, no communication);
  2. exchange: the D per-chunk aggregate elements are all-gathered over
     the ``t`` mesh axis (one small collective — D elements of size
     O(nx^2), NOT O(T) traffic — riding ICI);
  3. seed: each chip folds the combined aggregates of the chunks to its
     right (backward pass) / left (forward rollout) into its local scan.

Total comm = 2 all-gathers of O(D * nx^2) bytes; compute = O(T/D) local
work + O(D) tiny combines, vs O(T) sequential on one chip. Exact: same
KKT solution as ops.riccati.lqr_kkt_solve (tests/test_riccati_tsharded).

Inputs follow the batched contract [B, T, ...]: the batch axis may
simultaneously shard over a ``data`` mesh axis (2-D mesh: batch x horizon),
or replicate (1-D ``t`` mesh) — pass ``data_axis=None`` for the latter.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from diff_qp_mpc_tpu.ops.riccati import LQRSolution
from diff_qp_mpc_tpu.ops.riccati_pprefix import _combine

Array = jnp.ndarray
_PREC = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


def _mv(M, v):
    return jnp.einsum("...ij,...j->...i", M, v, precision=_PREC)


def _swap(M):
    return jnp.swapaxes(M, -1, -2)


def _identity_element(shape_bx, nx, dt):
    """Monoid identity for _combine: the 'empty interval' (exact pass-
    through map, no cost): A=I, b=0, C=0, eta=0, J=0."""
    eye = jnp.broadcast_to(jnp.eye(nx, dtype=dt), shape_bx + (nx, nx))
    zM = jnp.zeros(shape_bx + (nx, nx), dt)
    zv = jnp.zeros(shape_bx + (nx,), dt)
    return (eye, zv, zM, zv, zM)


def _compose_affine(a, b):
    """b after a (a earlier): x -> Mb(Ma x + ma) + mb."""
    Ma, ma = a
    Mb, mb = b
    return (_mm(Mb, Ma), _mv(Mb, ma) + mb)


def _tsharded_body(Cxx, Cxu, Cuu, gx, gu, Ap, Bp, rp, dx0,
                   *, t_axis: str, reg: float):
    """shard_map body: local chunks [B_loc, Tc, ...], dx0 [B_loc, nx].

    Ap/Bp/rp are the dynamics padded to length T (the terminal stage's
    rows are zero, making its value element (0, 0, 0, eta_T, J_T) — the
    same terminal element ops.riccati_pprefix constructs explicitly).
    """
    Bl, Tc, nx, nu = Cxu.shape
    dt = Cxx.dtype
    eyeu = jnp.eye(nu, dtype=dt)

    # ---- 1. local element construction (identical math to pprefix) ----
    Cuu_r = Cuu + reg * eyeu
    Hx = jnp.linalg.solve(Cuu_r, _swap(Cxu))          # Cuu^-1 Cxu^T
    hg = jnp.linalg.solve(Cuu_r, gu[..., None])[..., 0]
    J = Cxx - _mm(Cxu, Hx)
    J = 0.5 * (J + _swap(J))
    eta = -(gx - _mv(Cxu, hg))
    Ae = Ap - _mm(Bp, Hx)
    be = rp - _mv(Bp, hg)
    Ce = _mm(Bp, jnp.linalg.solve(Cuu_r, _swap(Bp)))
    Ce = 0.5 * (Ce + _swap(Ce))
    elems = (Ae, be, Ce, eta, J)

    # ---- 2. local suffix scan (on-chip, no comm) ----
    suffix = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), elems, reverse=True, axis=1)
    agg = jax.tree.map(lambda x: x[:, 0], suffix)     # chunk aggregate

    # ---- 3. exchange chunk aggregates + fold in the right seed ----
    gathered = jax.lax.all_gather(agg, t_axis)        # [D, B_loc, ...]
    D = gathered[0].shape[0]
    ident = _identity_element((Bl,), nx, dt)
    # seeds[d] = combine of aggregates d+1 .. D-1 (right-exclusive)
    seeds = [None] * D
    seeds[D - 1] = ident
    for d in range(D - 2, -1, -1):
        nxt = jax.tree.map(lambda x, d=d: x[d + 1], gathered)
        seeds[d] = _combine(nxt, seeds[d + 1])
    seeds = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *seeds)
    my = jax.lax.axis_index(t_axis)
    seed = jax.tree.map(lambda x: x[my], seeds)       # [B_loc, ...]

    seed_b = jax.tree.map(lambda x: x[:, None], seed)
    seeded = _combine(suffix, seed_b)
    Pv = seeded[4]                                    # [B_loc, Tc, nx, nx]
    pv = -seeded[3]
    P_seed, p_seed = seed[4], -seed[3]                # value at next chunk

    # ---- 4. per-stage gains (local; P_{t+1} of the chunk's last stage
    #        is exactly the right-seed's value function) ----
    Pn = jnp.concatenate([Pv[:, 1:], P_seed[:, None]], axis=1)
    pn = jnp.concatenate([pv[:, 1:], p_seed[:, None]], axis=1)
    PB = _mm(Pn, Bp)
    Quu = Cuu + _mm(_swap(Bp), PB) + reg * eyeu
    Qxu = Cxu + _mm(_swap(Ap), PB)
    qu = gu + _mv(_swap(Bp), _mv(Pn, rp) + pn)
    K = -jnp.linalg.solve(Quu, _swap(Qxu))
    k = -jnp.linalg.solve(Quu, qu[..., None])[..., 0]

    # ---- 5. forward rollout: distributed prefix scan of affine maps ----
    M = Ap + _mm(Bp, K)
    m = _mv(Bp, k) + rp
    pref = jax.lax.associative_scan(_compose_affine, (M, m), axis=1)
    agg_f = jax.tree.map(lambda x: x[:, -1], pref)
    gathered_f = jax.lax.all_gather(agg_f, t_axis)
    ident_f = (jnp.broadcast_to(jnp.eye(nx, dtype=dt), (Bl, nx, nx)),
               jnp.zeros((Bl, nx), dt))
    seeds_f = [None] * D
    seeds_f[0] = ident_f
    for d in range(1, D):
        prv = jax.tree.map(lambda x, d=d: x[d - 1], gathered_f)
        seeds_f[d] = _compose_affine(seeds_f[d - 1], prv)
    seeds_f = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *seeds_f)
    seed_f = jax.tree.map(lambda x: x[my], seeds_f)
    seeded_f = _compose_affine(jax.tree.map(lambda x: x[:, None], seed_f),
                               pref)
    # dx at local index 0 = seed_f(dx0); at index i>0 = seeded_f[i-1](dx0)
    dx_first = _mv(seed_f[0], dx0) + seed_f[1]
    dx_rest = _mv(seeded_f[0][:, :-1], dx0[:, None]) + seeded_f[1][:, :-1]
    dx = jnp.concatenate([dx_first[:, None], dx_rest], axis=1)
    du = _mv(K, dx) + k
    lam = -(_mv(Pv, dx) + pv)
    return dx, du, lam, K, k


def make_tsharded_lqr_solver(mesh: Mesh, t_axis: str = "t",
                             data_axis: Optional[str] = "data",
                             reg: float = 0.0):
    """Build a jittable horizon-sharded batched LQR-KKT solver.

    Returns ``solve(Cxx, Cxu, Cuu, gx, gu, A, B, r, dx0) -> LQRSolution``
    with the batched contract of ops.riccati.batched_lqr_kkt_solve:
    cost blocks [B, T, ...], dynamics [B, T-1, ...], dx0 [B, nx]. The T
    axis is sharded over mesh axis ``t_axis`` and (optionally) the batch
    axis over ``data_axis``. T must be divisible by mesh.shape[t_axis].
    """
    spec_T = P(data_axis, t_axis)
    spec_b = P(data_axis)
    body = functools.partial(_tsharded_body, t_axis=t_axis, reg=reg)
    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec_T,) * 8 + (spec_b,),
        out_specs=(spec_T,) * 5,
        check_vma=False,
    )

    def solve(Cxx, Cxu, Cuu, gx, gu, A, B, r, dx0):
        Bb, T, nx, nu = Cxu.shape
        dt = Cxx.dtype
        Ap = jnp.concatenate([A, jnp.zeros((Bb, 1, nx, nx), dt)], axis=1)
        Bp = jnp.concatenate([B, jnp.zeros((Bb, 1, nx, nu), dt)], axis=1)
        rp = jnp.concatenate([r, jnp.zeros((Bb, 1, nx), dt)], axis=1)
        dx, du, lam, K, k = sharded(Cxx, Cxu, Cuu, gx, gu, Ap, Bp, rp, dx0)
        return LQRSolution(dx=dx, du=du, lam=lam, K=K, k=k)

    return solve
