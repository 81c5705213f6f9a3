"""Parallel-prefix (associative-scan) Riccati LQR-KKT solve.

O(log T)-depth replacement for the sequential backward/forward recursions
in ops.riccati — the first-class TPU answer (SURVEY.md §5) to the
reference's unexploited block-tridiagonal structure (dense O((Tn)³) LU,
qpth/qp_wrapper.py:657-679 + batch_LU.py:224). The sequential scan is
latency-bound at long horizons (T dependent steps of small matrix algebra);
this formulation exposes the whole horizon to the MXU at once via
`jax.lax.associative_scan`, following the parallel LQT construction of
Särkkä & García-Fernández (IEEE TAC 2021; see also the parallel Riccati
factorization of arXiv:1407.6898 referenced in PAPERS.md).

Method. Each stage t contributes a *conditional value element*
e_t = (A, b, C, η, J) representing

    F_t(x, z) = ½ xᵀJx − ηᵀx + sup_λ [ λᵀ(z − Ax − b) − ½ λᵀCλ ],

the stage cost min-convolved over the control, as a function of the stage's
entry state x and exit state z (the dual sup-form keeps the representation
exact even when C = B Cuu⁻¹ Bᵀ is singular, nu < nx). Min-convolution of
two elements (interval concatenation) is closed and ASSOCIATIVE:

    L   = (I + C₁J₂)⁻¹
    A₁₂ = A₂ L A₁                      C₁₂ = A₂ L C₁ A₂ᵀ + C₂
    b₁₂ = A₂ L (b₁ + C₁η₂) + b₂        J₁₂ = A₁ᵀ Lᵀ J₂ A₁ + J₁
    η₁₂ = A₁ᵀ Lᵀ (η₂ − J₂ b₁) + η₁

so a reverse associative scan yields every suffix combination — i.e. every
cost-to-go V_t(x) = ½xᵀP_t x + p_tᵀ x (P = J, p = −η) — in O(log T)
combine rounds. Gains (K, k) then come from the standard one-step formulas
(all stages in parallel), and the closed-loop affine rollout
dx_{t+1} = (A+BK)dx_t + (Bk+r) is itself a parallel prefix composition of
affine maps. Exactness: this computes the same KKT solution as
ops.riccati.lqr_kkt_solve (cross-validated in tests/test_riccati_pprefix).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from diff_qp_mpc_tpu.ops.riccati import LQRSolution

Array = jnp.ndarray
_PREC = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)


def _mv(M, v):
    return jnp.einsum("...ij,...j->...i", M, v, precision=_PREC)


def _combine(e1, e2):
    """Min-convolve element e1 (earlier interval) with e2 (later)."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    nx = A1.shape[-1]
    eye = jnp.eye(nx, dtype=A1.dtype)
    # L = (I + C1 J2)^-1 applied from the left; Lᵀ = (I + J2 C1)^-1
    M = eye + _mm(C1, J2)  # [..., nx, nx]
    # stack the right-hand sides that need L: A1, C1, (b1 + C1 η2)
    rhs = jnp.concatenate([A1, C1, (b1 + _mv(C1, eta2))[..., None]], axis=-1)
    sol = jnp.linalg.solve(M, rhs)
    LA1 = sol[..., :nx]
    LC1 = sol[..., nx:2 * nx]
    Lb = sol[..., 2 * nx]
    # transpose-system solves: Mᵀ y = rhs  (Lᵀ rhs)
    MT = jnp.swapaxes(M, -1, -2)
    rhsT = jnp.concatenate(
        [_mm(J2, A1), (eta2 - _mv(J2, b1))[..., None]], axis=-1)
    solT = jnp.linalg.solve(MT, rhsT)
    LtJ2A1 = solT[..., :nx]
    Lteta = solT[..., nx]
    A12 = _mm(A2, LA1)
    b12 = _mv(A2, Lb) + b2
    C12 = _mm(A2, _mm(LC1, jnp.swapaxes(A2, -1, -2))) + C2
    C12 = 0.5 * (C12 + jnp.swapaxes(C12, -1, -2))
    eta12 = _mv(jnp.swapaxes(A1, -1, -2), Lteta) + eta1
    J12 = _mm(jnp.swapaxes(A1, -1, -2), LtJ2A1) + J1
    J12 = 0.5 * (J12 + jnp.swapaxes(J12, -1, -2))
    return (A12, b12, C12, eta12, J12)


def lqr_kkt_solve_pprefix(Cxx: Array, Cxu: Array, Cuu: Array,
                          gx: Array, gu: Array, A: Array, B: Array,
                          r: Array, dx0: Array, reg: float = 0.0
                          ) -> LQRSolution:
    """Single-instance parallel-prefix solve; same contract as
    ops.riccati.lqr_kkt_solve (theta/elastic rows unsupported — use the
    sequential kernel for SL1QP systems).

    reg enters as Levenberg damping on Cuu in the element construction
    (the sequential kernel regularizes Quu = Cuu + BᵀPB; both vanish as
    reg→0 and tests compare at reg ≤ 1e-9).
    """
    T, nx, nu = Cxu.shape
    dt = Cxx.dtype
    eyeu = jnp.eye(nu, dtype=dt)

    # ---- element construction, all stages in parallel ----
    chol = jax.vmap(lambda Mq: jax.scipy.linalg.cholesky(Mq, lower=True))(
        Cuu + reg * eyeu)
    csolve = jax.vmap(lambda L, b: jax.scipy.linalg.cho_solve((L, True), b))
    HCxuT = csolve(chol, jnp.swapaxes(Cxu, -1, -2))  # [T, nu, nx] Cuu⁻¹Cxuᵀ
    Hgu = csolve(chol, gu[..., None])[..., 0]
    J = Cxx - _mm(Cxu, HCxuT)
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    eta = -(gx - _mv(Cxu, Hgu))
    # stages 0..T-2 carry dynamics; stage T-1 is the terminal element
    # (A = b = C = 0: evaluating the suffix at z = 0 contributes nothing)
    Ae = jnp.concatenate(
        [A - _mm(B, HCxuT[:-1]), jnp.zeros((1, nx, nx), dt)], axis=0)
    be = jnp.concatenate([r - _mv(B, Hgu[:-1]), jnp.zeros((1, nx), dt)],
                         axis=0)
    HBT = csolve(chol[:-1], jnp.swapaxes(B, -1, -2))  # [T-1, nu, nx]
    Ce = jnp.concatenate([_mm(B, HBT), jnp.zeros((1, nx, nx), dt)], axis=0)
    Ce = 0.5 * (Ce + jnp.swapaxes(Ce, -1, -2))

    # ---- suffix combinations via reverse associative scan ----
    # reverse=True folds later elements into the left operand, so the
    # operator receives (later, earlier) and must flip:
    suffix = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), (Ae, be, Ce, eta, J), reverse=True)
    P = suffix[4]          # [T, nx, nx] value Hessians
    p = -suffix[3]         # [T, nx]     value gradients

    # ---- per-stage gains from (P, p) at t+1, all stages in parallel ----
    Pn = jnp.concatenate([P[1:], jnp.zeros((1, nx, nx), dt)], axis=0)
    pn = jnp.concatenate([p[1:], jnp.zeros((1, nx), dt)], axis=0)
    Ap = jnp.concatenate([A, jnp.zeros((1, nx, nx), dt)], axis=0)
    Bp = jnp.concatenate([B, jnp.zeros((1, nx, nu), dt)], axis=0)
    rp = jnp.concatenate([r, jnp.zeros((1, nx), dt)], axis=0)
    PB = _mm(Pn, Bp)
    Quu = Cuu + _mm(jnp.swapaxes(Bp, -1, -2), PB) + reg * eyeu
    Qxu = Cxu + _mm(jnp.swapaxes(Ap, -1, -2), PB)
    qu = gu + _mv(jnp.swapaxes(Bp, -1, -2), _mv(Pn, rp) + pn)
    cholq = jax.vmap(lambda Mq: jax.scipy.linalg.cholesky(Mq, lower=True))(Quu)
    K = -csolve(cholq, jnp.swapaxes(Qxu, -1, -2))
    k = -csolve(cholq, qu[..., None])[..., 0]

    # ---- closed-loop rollout as a parallel prefix of affine maps ----
    M = Ap[:-1] + _mm(Bp[:-1], K[:-1])  # [T-1, nx, nx]
    m = _mv(Bp[:-1], k[:-1]) + rp[:-1]  # [T-1, nx]

    def compose(a, b):  # b ∘ a (a earlier)
        Ma, ma = a
        Mb, mb = b
        return (_mm(Mb, Ma), _mv(Mb, ma) + mb)

    pref = jax.lax.associative_scan(compose, (M, m))
    dx_rest = _mv(pref[0], dx0) + pref[1]  # dx_{t+1}, t = 0..T-2
    dx = jnp.concatenate([dx0[None], dx_rest], axis=0)
    du = _mv(K, dx) + k
    lam = -(_mv(P, dx) + p)
    return LQRSolution(dx=dx, du=du, lam=lam, K=K, k=k)


batched_lqr_kkt_solve_pprefix = jax.vmap(
    lqr_kkt_solve_pprefix,
    in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None),
)
