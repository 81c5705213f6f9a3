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
