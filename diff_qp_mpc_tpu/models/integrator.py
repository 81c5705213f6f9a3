"""N-dimensional double-integrator dynamics.

Reference: deqmpc/envs.py:182-233 IntegratorDynamics — semi-implicit Euler
on (pos, vel) with acceleration control; the flagship DEQ-MPC training env
(deqmpc/run.sh uses --env integrator).
"""
from __future__ import annotations

import jax.numpy as jnp

from diff_qp_mpc_tpu.models.base import DynamicsModel

Array = jnp.ndarray


class Integrator(DynamicsModel):
    def __init__(self, nx: int = 2, nu: int = 1, dt: float = 0.1,
                 max_acc: float = 1.0, max_vel: float = 1.0):
        assert nx == 2 * nu, "integrator state is (pos, vel) pairs"
        self.nx = nx
        self.nu = nu
        self.nq = nx // 2
        self.dt = dt
        self.max_acc = max_acc
        self.max_vel = max_vel

    def step(self, x: Array, u: Array) -> Array:
        pos, vel = x[..., : self.nq], x[..., self.nq:]
        vel_n = vel + u * self.dt
        pos_n = pos + vel_n * self.dt
        return jnp.concatenate([pos_n, vel_n], axis=-1)

    def step_parts(self, xs, us):
        nq = self.nq
        pos, vel = xs[:nq], xs[nq:]
        vel_n = tuple(vel[i] + us[i] * self.dt for i in range(nq))
        pos_n = tuple(pos[i] + vel_n[i] * self.dt for i in range(nq))
        return pos_n + vel_n

    def action_clip(self, u: Array) -> Array:
        return jnp.clip(u, -self.max_acc, self.max_acc)

    def __hash__(self):
        return hash((type(self), self.nx, self.nu, self.dt, self.max_acc, self.max_vel))
