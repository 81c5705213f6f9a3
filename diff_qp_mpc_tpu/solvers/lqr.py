"""Infinite-horizon discrete LQR: DARE solve + terminal value-function
costs for stabilizing short-horizon MPC.

Motivation (round-5 cartpole-2L finding): finite-horizon tracking MPC
with a stage-only cost fails outright to stabilize the corrected
both-links-up 2-link cartpole — every budget up to T=60/qp_iter=10 in
f32 OR f64, with or without receding-horizon warm starts, holds 0/64
eval states upright, while the SAME solver with the terminal cost
x_Tᵀ P x_T (P the DARE solution at the upright linearization) holds
64/64 at T=5. This is the classical stabilizing-MPC result: the
terminal value function extends the effective horizon to infinity.

The reference has no terminal-cost support (its Tracking_MPC cost is
stage-diagonal only, policies.py:669-680); this is net-new capability
layered on the ip (trajectory-QP SQP) solver family, whose dense
per-stage cost blocks (solvers/trajqp.py) carry a dense terminal P
through every kernel — scan and fused Pallas alike — unchanged.

TPU notes: the DARE is solved once at setup time (nx ≤ 12 here), by
fixed-point iteration of the Riccati map under `lax.while_loop` — no
scipy/host dependency, works under jit, f64 recommended for the solve
itself (P entries reach ~3.6e4 on cartpole-2L).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def dare(A: Array, B: Array, Q: Array, R: Array,
         tol: float = 1e-9, max_iter: int = 10_000) -> Array:
    """Solve the discrete algebraic Riccati equation
    P = Q + Aᵀ P A − Aᵀ P B (R + Bᵀ P B)⁻¹ Bᵀ P A
    by fixed-point iteration from P₀ = Q.

    Converges for stabilizable (A, B) with detectable (A, Q^{1/2});
    linear rate — fine for the one-time setup solves this is used for.
    All math in the dtype of A (use f64: P is ill-conditioned for stiff
    robots).
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    Q = jnp.asarray(Q, A.dtype)
    R = jnp.asarray(R, A.dtype)

    def step(P):
        BtP = B.T @ P
        K = jnp.linalg.solve(R + BtP @ B, BtP @ A)
        return Q + A.T @ P @ (A - B @ K)

    def cond(carry):
        P, dP, it = carry
        return (dP > tol) & (it < max_iter)

    def body(carry):
        P, _, it = carry
        Pn = step(P)
        return Pn, jnp.max(jnp.abs(Pn - P)), it + 1

    P, _, _ = jax.lax.while_loop(
        cond, body, (Q, jnp.asarray(jnp.inf, A.dtype), 0))
    return 0.5 * (P + P.T)


def lqr_gain(A: Array, B: Array, Q: Array, R: Array) -> Tuple[Array, Array]:
    """(K, P): the infinite-horizon LQR gain u = −K x and value P."""
    P = dare(A, B, Q, R)
    BtP = B.T @ P
    K = jnp.linalg.solve(R + BtP @ B, BtP @ A)
    return K, P


def terminal_value_cost(model, x_goal: Array, u_goal: Optional[Array],
                        Q_diag: Array, R_diag: Array) -> Array:
    """Terminal P for tracking MPC: DARE at the goal linearization.

    model: a DynamicsModel (batched __call__(x, u) → x_next);
    Q_diag/R_diag: the STAGE cost diagonals the MPC actually uses, so
    the terminal cost is the exact infinite-horizon tail of that same
    stage cost. Solved in f64 regardless of the model dtype (P entries
    are large; the caller casts down when assembling the cost).
    """
    import numpy as np

    nx = int(jnp.asarray(x_goal).shape[-1])
    nu = int(jnp.asarray(R_diag).shape[-1])
    xg = jnp.asarray(x_goal)
    ug = (jnp.asarray(u_goal) if u_goal is not None
          else jnp.zeros((nu,), xg.dtype))

    def f(xu):
        return model(xu[None, :nx], xu[None, nx:])[0]

    J = np.asarray(jax.jacobian(f)(jnp.concatenate([xg, ug])), np.float64)
    A, B = J[:, :nx], J[:, nx:]
    # HOST-side f64 fixed point: without jax_enable_x64 the jnp dare()
    # silently truncates to f32, where tol=1e-9 is unreachable and the
    # stiff P (entries ~3.6e4 on cartpole-2L) loses the cross terms the
    # stabilization depends on. Setup-time cost, so numpy is fine.
    Q = np.diag(np.asarray(Q_diag, np.float64))
    R = np.diag(np.asarray(R_diag, np.float64))
    P, dP = Q, np.inf
    for _ in range(10_000):
        BtP = B.T @ P
        K = np.linalg.solve(R + BtP @ B, BtP @ A)
        Pn = Q + A.T @ P @ (A - B @ K)
        dP = np.max(np.abs(Pn - P))
        P = Pn
        if dP < 1e-9:
            break
    return jnp.asarray(0.5 * (P + P.T))
