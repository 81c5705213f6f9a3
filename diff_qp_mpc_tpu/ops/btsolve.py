"""Batched block-tridiagonal Cholesky factor/solve — the KKT workhorse.

Every linear system in this framework is block tridiagonal in time with
block size n = nx+nu: the AL merit Hessian Q + ρJᵀJ (reference densifies it
and calls torch.linalg.cholesky_ex, qpth/al_utils.py:414-427 — O((Tn)³)),
and the trajectory-QP KKT systems the reference LU-factorizes dense
(qpth/solvers/pdipm/batch_LU.py:224, qpth/qp_wrapper.py:657-679). This
module is the TPU-native replacement: an O(T n³) block factorization
expressed as lax.scan over time with the batch axis carried by vmap, so XLA
lowers it to batched small-matrix kernels with no host control flow.

Factorization (lower block bidiagonal L):
    H = L Lᵀ,   L = [[L₀        ],
                     [S₁ L₁     ],
                     [   S₂ L₂  ], ...]
    L₀L₀ᵀ = D₀;   Sₜ = Oₜ₋₁ Lₜ₋₁⁻ᵀ;   LₜLₜᵀ = Dₜ − SₜSₜᵀ
where D are the diagonal blocks and Oₜ = H[t+1, t] the subdiagonal blocks.

Never branches to a dense rescue path on factorization failure: callers
pass always-on Levenberg damping `reg` instead (the BaSpaCho `damp` concept,
reference qpth/extlib/baspacho_solver.h:43), keeping the kernel branch-free
under jit.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

Array = jnp.ndarray

# TPU MXU matmuls default to reduced-precision passes; the factorization is
# only SPD-stable at full f32 accumulation (NaNs otherwise — observed on
# v5e). Every matmul in this module pins HIGHEST precision.
_PREC = jax.lax.Precision.HIGHEST


def _mm(a: Array, b: Array) -> Array:
    return jnp.matmul(a, b, precision=_PREC)


class BTFactor(NamedTuple):
    """Cholesky factor of a block-tridiagonal SPD matrix.

    L: [..., T, n, n] lower-triangular diagonal blocks
    S: [..., T, n, n] subdiagonal blocks of the factor (S[..., 0] is zero
       padding so both stack to the same length for scan friendliness).
    """

    L: Array
    S: Array


def _chol(M: Array) -> Array:
    return jnp.linalg.cholesky(M)


def factor(D: Array, O: Array, reg: float | Array = 0.0) -> BTFactor:
    """Factor a single block-tridiagonal SPD matrix.

    D: [T, n, n] diagonal blocks; O: [T-1, n, n] subdiagonal blocks
    (O[t] = H[t+1, t]); reg: Levenberg damping added to every diagonal.
    vmap over a leading batch axis for the batched version.
    """
    T, n, _ = D.shape
    eye = jnp.eye(n, dtype=D.dtype)
    D = D + reg * eye

    L0 = _chol(D[0])

    def body(L_prev, DO):
        Dt, Ot = DO
        # S = O @ L_prev^-T  <=>  solve L_prev Sᵀ = Oᵀ
        St = solve_triangular(L_prev, Ot.T, lower=True).T
        Lt = _chol(Dt - _mm(St, St.T))
        return Lt, (Lt, St)

    _, (Ls, Ss) = jax.lax.scan(body, L0, (D[1:], O))
    L = jnp.concatenate([L0[None], Ls], axis=0)
    S = jnp.concatenate([jnp.zeros((1, n, n), D.dtype), Ss], axis=0)
    return BTFactor(L, S)


def solve(fac: BTFactor, b: Array) -> Array:
    """Solve H x = b given the factor. b: [T, n] -> x: [T, n]."""
    L, S = fac.L, fac.S

    # Forward: L y = b  (block forward substitution)
    y0 = solve_triangular(L[0], b[0], lower=True)

    def fwd(y_prev, LSb):
        Lt, St, bt = LSb
        yt = solve_triangular(Lt, bt - _mm(St, y_prev), lower=True)
        return yt, yt

    _, ys = jax.lax.scan(fwd, y0, (L[1:], S[1:], b[1:]))
    y = jnp.concatenate([y0[None], ys], axis=0)

    # Backward: Lᵀ x = y
    T = y.shape[0]
    xT = solve_triangular(L[T - 1].T, y[T - 1], lower=False)

    def bwd(x_next, LSy):
        Lt, S_next, yt = LSy
        xt = solve_triangular(Lt.T, yt - _mm(S_next.T, x_next), lower=False)
        return xt, xt

    _, xs = jax.lax.scan(
        bwd, xT, (L[: T - 1][::-1], S[1:][::-1], y[: T - 1][::-1])
    )
    return jnp.concatenate([xs[::-1], xT[None]], axis=0)


def factor_solve(D: Array, O: Array, b: Array, reg: float | Array = 0.0) -> Array:
    return solve(factor(D, O, reg), b)


# Batched versions: batch axis leading.
batched_factor = jax.vmap(factor, in_axes=(0, 0, None), out_axes=BTFactor(0, 0))
batched_solve = jax.vmap(solve)


def batched_factor_solve(D: Array, O: Array, b: Array, reg: float | Array = 0.0) -> Array:
    """D: [bsz, T, n, n], O: [bsz, T-1, n, n], b: [bsz, T, n]."""
    return batched_solve(batched_factor(D, O, reg), b)


# ---------------------------------------------------------------------------
# Dense assembly (tests / cross-checks only — this is what the reference
# builds in production, qpth/al_utils.py:100-101)
# ---------------------------------------------------------------------------


def to_dense(D: Array, O: Array) -> Array:
    """Assemble the [T*n, T*n] dense matrix from blocks (single instance)."""
    T, n, _ = D.shape
    H = jnp.zeros((T * n, T * n), D.dtype)
    for t in range(T):
        H = H.at[t * n:(t + 1) * n, t * n:(t + 1) * n].set(D[t])
    for t in range(T - 1):
        H = H.at[(t + 1) * n:(t + 2) * n, t * n:(t + 1) * n].set(O[t])
        H = H.at[t * n:(t + 1) * n, (t + 1) * n:(t + 2) * n].set(O[t].T)
    return H


def quadratic_form(D: Array, O: Array, v: Array) -> Array:
    """vᵀ H v for block-tridiagonal H without densifying. v: [T, n]."""
    diag = jnp.einsum("ti,tij,tj->", v, D, v, precision=_PREC)
    off = 2.0 * jnp.einsum("ti,tij,tj->", v[1:], O, v[:-1], precision=_PREC)
    return diag + off


def matvec(D: Array, O: Array, v: Array) -> Array:
    """H v for block-tridiagonal H. v: [T, n] -> [T, n]."""
    out = jnp.einsum("tij,tj->ti", D, v, precision=_PREC)
    out = out.at[1:].add(jnp.einsum("tij,tj->ti", O, v[:-1], precision=_PREC))
    out = out.at[:-1].add(jnp.einsum("tji,tj->ti", O, v[1:], precision=_PREC))
    return out
