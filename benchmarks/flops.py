"""Analytic FLOP counts for the hot kernels → speed-of-light fractions.

BASELINE.md commits to per-chip speed-of-light accounting on the
Riccati/KKT kernels; wall-times alone (r1 prof_components) can't answer
"is it actually fast?". These are *algorithmic* FLOP counts (useful math
ops of the textbook algorithm, multiply+add counted separately) — a lower
bound on hardware ops, so SoL fractions computed from them are
conservative.

Peaks (TPU v5e, per chip) — public figures / derived estimates:
- MXU: 197 TFLOP/s bf16 (published). f32 matmul via the MXU runs at
  ~1/4 bf16 rate with full-precision accumulation (three-pass style);
  49 TFLOP/s is used as the f32 matmul peak.
- VPU (vector unit): 8×128 lanes × 4 ALUs × ~0.94 GHz ≈ 3.9 TFLOP/s f32
  elementwise (estimate; the batch-of-scalars fused solver is VPU-bound,
  MXU idle by design).
- HBM: 819 GB/s (published).
"""
from __future__ import annotations

V5E_MXU_BF16_PEAK = 197e12
V5E_MXU_F32_PEAK = 49e12
V5E_VPU_F32_PEAK = 3.9e12
V5E_HBM_BYTES_PER_S = 819e9

# per-coordinate cost of one dynamics step evaluation (pendulum-class
# closed forms: a few transcendentals + muls; transcendentals counted as 8)
_STEP_FLOPS_PER_COORD = 12


def _chol_flops(n: int) -> float:
    """Cholesky of an n×n SPD matrix (n³/3) + two triangular solves (2n²)."""
    return n ** 3 / 3 + 2 * n ** 2


def fused_al_flops(T: int, nx: int, nu: int, al_iter: int, n_newton: int,
                   n_ls: int) -> float:
    """FLOPs per solve of the whole-solver fused AL kernel
    (ops/al_fused_pallas): AL outer loop × (Newton: Jacobian + GN Hessian
    assembly, block-tridiagonal factor+solve, batched 2⁻ᵏ line search) +
    multiplier updates."""
    n = nx + nu
    jac = nx * (nx + nu) * _STEP_FLOPS_PER_COORD  # jvp-per-input-dim
    hess_blocks = 6 * n * n * nx                   # ρJᵀJ + cost diag, D and O
    grad = 4 * n * nx + 2 * n                      # merit gradient terms
    factor = T * (_chol_flops(n) + 2 * n ** 3)     # block factor incl. off-diag
    solve = T * 4 * n ** 2
    rollout = T * nx * _STEP_FLOPS_PER_COORD
    merit = T * (4 * n + 3 * nx + 2 * nx * _STEP_FLOPS_PER_COORD)
    newton = T * (jac + hess_blocks + grad) + factor + solve \
        + n_ls * (rollout + merit)
    lam_upd = T * (13 * nx + 6 * nu)
    return al_iter * (n_newton * newton + lam_upd)


def btsolve_flops(T: int, n: int) -> float:
    """Block-tridiagonal Cholesky factor+solve per batch element
    (ops/btsolve, ops/btsolve_pallas)."""
    return T * (_chol_flops(n) + 2 * n ** 3 + 4 * n ** 2)


def riccati_flops(T: int, nx: int, nu: int) -> float:
    """Sequential Riccati backward+forward per batch element (ops/riccati):
    per stage ~6 matmuls nx³-class + Quu Cholesky + gain solves."""
    return T * (6 * nx ** 3 + 4 * nx ** 2 * nu + 2 * nx * nu ** 2
                + _chol_flops(nu) + 2 * nu ** 2 * nx + 6 * nx ** 2)


def riccati_pprefix_flops(T: int, nx: int, nu: int) -> float:
    """Parallel-prefix Riccati per batch element: T log₂T combines, each
    ~6 nx³-class ops (solves + matmuls), + elementwise stages."""
    import math

    logT = max(1, math.ceil(math.log2(max(T, 2))))
    combine = 6 * nx ** 3 + 2 * nx ** 3 / 3  # matmuls + LU solve
    return T * logT * combine + riccati_flops(T, nx, nu)


def bytes_per_solve(T: int, nx: int, nu: int) -> float:
    """HBM traffic per solve of the fused kernel (f32): read cost (Cd, c),
    x0, inits; write solution + residual."""
    n = nx + nu
    return 4.0 * (2 * T * n + nx + T * n + T * nu + T * n + 1)
