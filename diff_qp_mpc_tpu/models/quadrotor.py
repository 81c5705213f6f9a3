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

import jax
import jax.numpy as jnp
import numpy as np

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
        Jw = jnp.einsum("ij,...j->...i", self._J, w,
                        precision=jax.lax.Precision.HIGHEST)
        wdot = jnp.einsum("ij,...j->...i", self._Jinv, tau - jnp.cross(w, Jw),
                          precision=jax.lax.Precision.HIGHEST)
        return jnp.concatenate([rdot, mdot, vdot, wdot], axis=-1)

    def step(self, x: Array, u: Array) -> Array:
        return rk4(self._ode, x, u, self.dt)

    def hover_thrust(self) -> Array:
        """Per-rotor control that balances gravity and the thrust bias."""
        per_rotor = (self.m * 9.81 - 4.0 * self.bf) / (4.0 * self.kf)
        return jnp.full((self.nu,), per_rotor / self.act_scale)

    def __hash__(self):
        return hash((type(self), self.m, self.dt, self.kf, self.km))


def _parts_rk4(ode_parts, xs, us, dt):
    """RK4 on tuples of same-shaped arrays (for step_parts)."""
    add = lambda a, b, s: tuple(ai + s * bi for ai, bi in zip(a, b))
    k1 = ode_parts(xs, us)
    k2 = ode_parts(add(xs, k1, 0.5 * dt), us)
    k3 = ode_parts(add(xs, k2, 0.5 * dt), us)
    k4 = ode_parts(add(xs, k3, dt), us)
    return tuple(x + (dt / 6.0) * (a + 2 * b + 2 * c + d)
                 for x, a, b, c, d in zip(xs, k1, k2, k3, k4))


def _quad_ode_parts(model: "RexQuadrotor", xs, us):
    """Coordinate-wise quadrotor ODE (RexQuadrotor.step_parts backend).

    Everything is closed-form polynomial/rational in the 12 state coords —
    MRP→quaternion, quaternion rotation, MRP kinematics, Newton–Euler —
    so the fused Pallas kernels run this model directly."""
    r = xs[0:3]
    m = xs[3:6]
    v = xs[6:9]
    w = xs[9:12]
    u = tuple(model.act_scale * ui for ui in us)

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    def quat_of(mrp):
        sq = mrp[0] ** 2 + mrp[1] ** 2 + mrp[2] ** 2
        inv = 1.0 / (1.0 + sq)
        return ((1.0 - sq) * inv, 2 * mrp[0] * inv, 2 * mrp[1] * inv,
                2 * mrp[2] * inv)

    def quat_rot(q, vec):
        qs, qv = q[0], q[1:]
        c = cross(qv, vec)
        dot_qv = qv[0] ** 2 + qv[1] ** 2 + qv[2] ** 2
        dot_qr = qv[0] * vec[0] + qv[1] * vec[1] + qv[2] * vec[2]
        return tuple((qs * qs - dot_qv) * vec[i] + 2 * qv[i] * dot_qr
                     + 2 * qs * c[i] for i in range(3))

    # forces (body frame)
    F_z = model.kf * (u[0] + u[1] + u[2] + u[3])
    g_vec = (m[0] * 0.0, m[0] * 0.0, m[0] * 0.0 - 9.81 * model.m)
    q_inv = quat_of(tuple(-mi for mi in m))
    g_body = quat_rot(q_inv, g_vec)
    # drag terms (cd defaults to 0 — match the array path exactly)
    cdv = np.asarray(model._cd)
    cAv = np.asarray(model._cross_A)
    df = tuple(-jnp.sign(m[i]) * 0.5 * 1.27 * m[i] * m[i]
               * float(cdv[i]) * float(cAv[i]) for i in range(3))
    Bf_z = 4.0 * model.bf
    F = (g_body[0] + df[0], g_body[1] + df[1],
         g_body[2] + df[2] + F_z + Bf_z)

    # moments
    Mk = tuple(model.km * ui for ui in u)
    tau3 = Mk[0] - Mk[1] + Mk[2] - Mk[3]
    ss = np.asarray(model._ss)  # [4, 3] static
    t0 = t1 = t2 = m[0] * 0.0
    for k in range(4):
        arm = (model.motor_dist * float(ss[k, 0]),
               model.motor_dist * float(ss[k, 1]),
               model.motor_dist * float(ss[k, 2]))
        thrust = model.kf * u[k] + model.bf
        # arm × (0, 0, thrust)
        t0 = t0 + arm[1] * thrust
        t1 = t1 - arm[0] * thrust
    tau = (t0, t1, t2 + tau3)

    # kinematics
    q = quat_of(m)
    rdot = quat_rot(q, v)
    p0, p1, p2 = m
    A1 = (1 + p0**2 - p1**2 - p2**2, 2 * (p0 * p1 - p2), 2 * (p0 * p2 + p1))
    A2 = (2 * (p1 * p0 + p2), 1 - p0**2 + p1**2 - p2**2, 2 * (p1 * p2 - p0))
    A3 = (2 * (p2 * p0 - p1), 2 * (p2 * p1 + p0), 1 - p0**2 - p1**2 + p2**2)
    mdot = tuple(0.25 * (row[0] * w[0] + row[1] * w[1] + row[2] * w[2])
                 for row in (A1, A2, A3))

    wxv = cross(w, v)
    vdot = tuple(F[i] / model.m - wxv[i] for i in range(3))
    J = np.asarray(model._J)
    Jinv = np.asarray(model._Jinv)
    Jw = tuple(sum(float(J[i, j]) * w[j] for j in range(3)) for i in range(3))
    wxJw = cross(w, Jw)
    rhs = tuple(tau[i] - wxJw[i] for i in range(3))
    wdot = tuple(sum(float(Jinv[i, j]) * rhs[j] for j in range(3))
                 for i in range(3))
    return rdot + mdot + vdot + wdot


def _quad_step_parts(self, xs, us):
    return _parts_rk4(lambda x, u: _quad_ode_parts(self, x, u),
                      xs, us, self.dt)


RexQuadrotor.step_parts = _quad_step_parts
