"""Generic Lagrangian-mechanics dynamics from energy functions.

The reference ships 37 kLoC of CasADi-generated C/CUDA with hand-managed
analytic derivatives for its rigid-body models (deqmpc/my_envs/*/src/
generated_dynamics.c, generated_derivatives.c). The JAX-native equivalent:
write the kinetic/potential energy, derive the equations of motion with
autodiff, and let ``jacfwd`` of the integrated step provide the analytic
Jacobians. XLA traces the whole thing into fused kernels — the same
"closed-form expression graph" CasADi builds, without codegen.

Manipulator equation, derived automatically:
    M(q) q̈ + c(q, q̇) = τ,   M = ∂²T/∂q̇²,
    c = (∂²L/∂q̇∂q) q̇ − ∂L/∂q          (L = T − V)
so  q̈ = M(q)⁻¹ (τ − c).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# Energy function: (q, qdot) -> scalar
EnergyFn = Callable[[Array, Array], Array]


def manipulator_accel(kinetic: EnergyFn, potential: Callable[[Array], Array],
                      q: Array, qdot: Array, tau: Array) -> Array:
    """q̈ for a single (unbatched) configuration."""

    def L(q, qdot):
        return kinetic(q, qdot) - potential(q)

    Mq = jax.hessian(kinetic, argnums=1)(q, qdot)
    dL_dqdot = jax.grad(L, argnums=1)
    # c = (∂/∂q ∂L/∂q̇) q̇ − ∂L/∂q
    dq_dqdot = jax.jacfwd(dL_dqdot, argnums=0)(q, qdot)  # [nq, nq]
    c = dq_dqdot @ qdot - jax.grad(L, argnums=0)(q, qdot)
    return jnp.linalg.solve(Mq, tau - c)


def lagrangian_ode(kinetic: EnergyFn, potential: Callable[[Array], Array],
                   input_map: Callable[[Array, Array], Array]):
    """Continuous dynamics ẋ = f(x, u) for x = (q, q̇).

    input_map(q, u) -> generalized forces τ (e.g. actuation selection).
    """

    def ode(x: Array, u: Array) -> Array:
        nq = x.shape[-1] // 2
        q, qdot = x[..., :nq], x[..., nq:]
        tau = input_map(q, u)
        qddot = manipulator_accel(kinetic, potential, q, qdot, tau)
        return jnp.concatenate([qdot, qddot], axis=-1)

    return ode


def manipulator_accel_parts(kinetic: EnergyFn,
                            potential: Callable[[Array], Array],
                            q, qd, tau):
    """Coordinate-wise q̈ on tuples of same-shaped arrays.

    Same physics as :func:`manipulator_accel`, restructured for the fused
    Pallas kernels (ops/al_fused_pallas), where each state coordinate lives
    as a separate batch tile and stacking onto a minor axis would force
    catastrophic Mosaic lane padding. The energy closures already index
    coordinates as ``q[i]`` / ``qd[i]``, so they accept tuples unchanged.

    Derivatives use grad-of-sum (exact here: the energies are elementwise
    across the batch tiles, so ∂ Σ_b T(b) / ∂ q̇ᵢ(b) = ∂T(b)/∂q̇ᵢ(b)), and
    the mass-matrix solve is an unrolled no-pivot Gaussian elimination —
    M(q) is SPD, so every pivot is positive and all ops stay elementwise.
    """
    nq = len(q)
    q, qd, tau = tuple(q), tuple(qd), tuple(tau)

    def Lsum(q_t, qd_t):
        return (kinetic(q_t, qd_t) - potential(q_t)).sum()

    # ∂L/∂q̇ = ∂T/∂q̇ (V is q̇-independent); reused for M and for c.
    gL_qd = jax.grad(Lsum, argnums=1)
    # mass matrix entries M[i][j] = ∂²T/∂q̇ᵢ∂q̇ⱼ
    M = []
    for i in range(nq):
        row = jax.grad(lambda qd_t, q_t, i=i: gL_qd(q_t, qd_t)[i].sum(),
                       argnums=0)(qd, q)
        M.append(list(row))
    # c = (∂²L/∂q̇∂q) q̇ − ∂L/∂q
    c = []
    for i in range(nq):
        dgi_dq = jax.grad(lambda q_t, qd_t, i=i: gL_qd(q_t, qd_t)[i].sum(),
                          argnums=0)(q, qd)
        c.append(sum(dgi_dq[j] * qd[j] for j in range(nq)))
    gL_q = jax.grad(Lsum, argnums=0)(q, qd)
    b = [tau[i] - c[i] + gL_q[i] for i in range(nq)]

    # Solve M q̈ = b with scalar-entry Gaussian elimination (no pivoting).
    A = [rw[:] for rw in M]
    for k in range(nq):
        inv = 1.0 / A[k][k]
        for r in range(k + 1, nq):
            f = A[r][k] * inv
            for s in range(k + 1, nq):
                A[r][s] = A[r][s] - f * A[k][s]
            b[r] = b[r] - f * b[k]
    qdd = [None] * nq
    for i in reversed(range(nq)):
        acc = b[i]
        for j in range(i + 1, nq):
            acc = acc - A[i][j] * qdd[j]
        qdd[i] = acc / A[i][i]
    return tuple(qdd)


def lagrangian_ode_parts(kinetic: EnergyFn,
                         potential: Callable[[Array], Array],
                         input_map_parts, nq: int):
    """Parts variant of :func:`lagrangian_ode`: tuples in, tuples out.

    input_map_parts(q_tuple, u_tuple) -> τ tuple of length nq.
    """

    def ode_parts(xs, us):
        q, qd = xs[:nq], xs[nq:]
        tau = input_map_parts(q, us)
        qdd = manipulator_accel_parts(kinetic, potential, q, qd, tau)
        return tuple(qd) + qdd

    return ode_parts
