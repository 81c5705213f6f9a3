"""Pendulum dynamics (θ-state and cos/sin-state variants).

Reference behaviors reproduced:
- 2-state (θ, θ̇) semi-implicit-Euler pendulum used by DEQ-MPC training
  (deqmpc/envs.py:5-57): θ measured from upright, gravity *destabilizing*
  (θ̈ = (u + m g l sin θ) / (m l²)).
- 3-state (cos θ, sin θ, θ̇) legacy qpth pendulum (qpth/env_dx/pendulum.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from diff_qp_mpc_tpu.models.base import DynamicsModel

Array = jnp.ndarray


class Pendulum(DynamicsModel):
    """2-state pendulum, semi-implicit Euler (deqmpc/envs.py:23-47)."""

    def __init__(self, dt: float = 0.05, m: float = 1.0, l: float = 1.0,
                 g: float = 10.0, max_torque: float = 3.0):
        self.dt = dt
        self.m = m
        self.l = l
        self.g = g
        self.max_torque = max_torque
        self.nx = 2
        self.nu = 1
        self.nq = 1

    def step(self, x: Array, u: Array) -> Array:
        th, thdot = x[..., 0], x[..., 1]
        tau = u[..., 0]
        thddot = (tau + self.m * self.g * self.l * jnp.sin(th)) / (self.m * self.l**2)
        new_thdot = thdot + thddot * self.dt
        new_th = th + new_thdot * self.dt
        return jnp.stack([new_th, new_thdot], axis=-1)

    def step_parts(self, xs, us):
        th, thdot = xs
        (tau,) = us
        thddot = (tau + self.m * self.g * self.l * jnp.sin(th)) / (self.m * self.l**2)
        new_thdot = thdot + thddot * self.dt
        new_th = th + new_thdot * self.dt
        return (new_th, new_thdot)

    def action_clip(self, u: Array) -> Array:
        return jnp.clip(u, -self.max_torque, self.max_torque)

    def state_clip(self, x: Array) -> Array:
        from diff_qp_mpc_tpu.models.base import angle_normalize

        return x.at[..., 0].set(angle_normalize(x[..., 0]))

    def __hash__(self):
        return hash((type(self), self.dt, self.m, self.l, self.g, self.max_torque))


class PendulumCosSin(DynamicsModel):
    """3-state (cos θ, sin θ, θ̇) pendulum, the legacy qpth encoding
    (qpth/env_dx/pendulum.py:18-105): Euler step on θ̇ with gravity toward
    the *down* equilibrium (θ measured from upright, torque-limited)."""

    def __init__(self, dt: float = 0.05, m: float = 1.0, l: float = 1.0,
                 g: float = 10.0, max_torque: float = 2.0):
        self.dt = dt
        self.m = m
        self.l = l
        self.g = g
        self.max_torque = max_torque
        self.nx = 3
        self.nu = 1
        self.nq = 2

    def step(self, x: Array, u: Array) -> Array:
        cos_th, sin_th, thdot = x[..., 0], x[..., 1], x[..., 2]
        th = jnp.arctan2(sin_th, cos_th)
        tau = jnp.clip(u[..., 0], -self.max_torque, self.max_torque)
        thddot = (
            -3.0 * self.g / (2.0 * self.l) * (-sin_th)
            + 3.0 * tau / (self.m * self.l**2)
        )
        new_thdot = thdot + thddot * self.dt
        new_th = th + new_thdot * self.dt
        return jnp.stack([jnp.cos(new_th), jnp.sin(new_th), new_thdot], axis=-1)

    def __hash__(self):
        return hash((type(self), self.dt, self.m, self.l, self.g, self.max_torque))
