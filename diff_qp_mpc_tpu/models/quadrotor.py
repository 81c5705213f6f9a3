"""Rex quadrotor: 12-state, 4-rotor rigid-body dynamics with MRP attitude.

Capability parity with deqmpc/rex_quadrotor.py RexQuadrotor_dynamics
(:51-130): state (position r, MRP m, body-frame velocity v, body rates ω);
forces = rotor thrust (kf·u + 4·bf bias) + quadratic body drag + gravity
rotated into the body frame; moments = yaw drag torque (km) + thrust
moments about the motor arms; kinematics ṙ = R(q)·v, ṁ = ¼A(m)ω; Newton-
Euler v̇ = F/m − ω×v, ω̇ = J⁻¹(τ − ω×Jω). RK4 integration, same default
physical parameters, act_scale = 100.
"""
from __future__ import annotations

import jax.numpy as jnp

from diff_qp_mpc_tpu.models.base import DynamicsModel, rk4
from diff_qp_mpc_tpu.models.rotation import mrp_kinematics, mrp_to_quat, quat_rotate

Array = jnp.ndarray


class RexQuadrotor(DynamicsModel):
    def __init__(self, mass: float = 2.0, dt: float = 0.05,
                 motor_dist: float = 0.28, kf: float = 0.0244101,
                 bf: float = -30.48576, km: float = 0.00029958,
                 bm: float = -0.367697, act_scale: float = 100.0,
                 cross_A=(0.25, 0.25, 0.25), cd=(0.0, 0.0, 0.0),
                 min_throttle: float = 1148.0, max_throttle: float = 1832.0):
        self.m = mass
        self.dt = dt
        self.motor_dist = motor_dist
        self.kf = kf
        self.bf = bf
        self.km = km
        self.bm = bm
        self.act_scale = act_scale
        self.min_throttle = min_throttle
        self.max_throttle = max_throttle
        self.nx = 12
        self.nu = 4
        self.nq = 6
        self._J = jnp.array([
            [0.01566089, 0.00000318037, 0.0],
            [0.00000318037, 0.01562078, 0.0],
            [0.0, 0.0, 0.02226868],
        ])
        self._Jinv = jnp.linalg.inv(self._J)
        self._g = jnp.array([0.0, 0.0, -9.81])
        self._cd = jnp.asarray(cd)
        self._cross_A = jnp.asarray([cross_A[0], cross_A[1], cross_A[1]])
        ss = jnp.array([[1.0, 1, 0], [1.0, -1, 0], [-1.0, -1, 0], [-1.0, 1, 0]])
        self._ss = ss / jnp.linalg.norm(ss, axis=-1, keepdims=True)

    # --- wrenches (reference rex_quadrotor.py:51-90) ---
    def _forces(self, x: Array, u: Array) -> Array:
        m = x[..., 3:6]
        q_inv = mrp_to_quat(-m)  # world→body rotation
        F_z = jnp.sum(self.kf * u, axis=-1)
        F = jnp.stack([jnp.zeros_like(F_z), jnp.zeros_like(F_z), F_z], axis=-1)
        # quadratic drag on the (MRP-proxy) state, as in the reference
        df = -jnp.sign(m) * 0.5 * 1.27 * (m * m) * self._cd * self._cross_A
        Bf = jnp.array([0.0, 0.0, 4.0 * self.bf])
        return F + df + quat_rotate(q_inv, self.m * self._g) + Bf

    def _moments(self, x: Array, u: Array) -> Array:
        M = self.km * u
        tau3 = M[..., 0] - M[..., 1] + M[..., 2] - M[..., 3]
        z = jnp.zeros_like(tau3)
        torque = jnp.stack([z, z, tau3], axis=-1)
        zeros = jnp.zeros_like(u)
        thrust_vec = jnp.stack([zeros, zeros, self.kf * u + self.bf], axis=-1)
        arms = self.motor_dist * self._ss
        torque = torque + jnp.sum(jnp.cross(arms, thrust_vec), axis=-2)
        return torque

    def _ode(self, x: Array, u: Array) -> Array:
        u = self.act_scale * u
        r, m, v, w = x[..., :3], x[..., 3:6], x[..., 6:9], x[..., 9:]
        q = mrp_to_quat(m)
        F = self._forces(x, u)
        tau = self._moments(x, u)
        rdot = quat_rotate(q, v)
        mdot = mrp_kinematics(m, w)
        vdot = F / self.m - jnp.cross(w, v)
        Jw = jnp.einsum("ij,...j->...i", self._J, w)
        wdot = jnp.einsum("ij,...j->...i", self._Jinv, tau - jnp.cross(w, Jw))
        return jnp.concatenate([rdot, mdot, vdot, wdot], axis=-1)

    def step(self, x: Array, u: Array) -> Array:
        return rk4(self._ode, x, u, self.dt)

    def hover_thrust(self) -> Array:
        """Per-rotor control that balances gravity and the thrust bias."""
        per_rotor = (self.m * 9.81 - 4.0 * self.bf) / (4.0 * self.kf)
        return jnp.full((self.nu,), per_rotor / self.act_scale)

    def __hash__(self):
        return hash((type(self), self.m, self.dt, self.kf, self.km))
