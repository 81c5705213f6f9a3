"""Quaternion / Modified-Rodrigues-Parameter (MRP) attitude math.

Capability parity with deqmpc/rexquad_utils.py (mrp2quat, quat2mrp,
quatrot, w2pdotkinematics_mrp, euler_to_quaternion, rk4/euler). Formulas
are the standard ones from Markley & Crassidis, *Fundamentals of
Spacecraft Attitude Determination and Control* (eq. 3.24 for the MRP
kinematics). Quaternions are scalar-first (w, x, y, z).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def mrp_to_quat(m: Array) -> Array:
    """MRP → unit quaternion: q = (1 − |m|², 2m) / (1 + |m|²)."""
    sq = jnp.sum(m * m, axis=-1, keepdims=True)
    return jnp.concatenate([1.0 - sq, 2.0 * m], axis=-1) / (1.0 + sq)


def quat_to_mrp(q: Array) -> Array:
    """Unit quaternion → MRP: m = q_v / (1 + q_w)."""
    return q[..., 1:] / (1.0 + q[..., :1])


def quat_rotate(q: Array, r: Array) -> Array:
    """Rotate vector r by quaternion q (active rotation)."""
    qs = q[..., :1]
    qv = q[..., 1:]
    cross = jnp.cross(qv, r)
    return ((qs**2 - jnp.sum(qv * qv, axis=-1, keepdims=True)) * r
            + 2.0 * qv * jnp.sum(qv * r, axis=-1, keepdims=True)
            + 2.0 * qs * cross)


def mrp_to_rot(m: Array) -> Array:
    """MRP → rotation matrix (via the quaternion)."""
    q = mrp_to_quat(m)
    qs = q[..., 0]
    x, y, z = q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y**2 + z**2), 2 * (x * y - qs * z), 2 * (x * z + qs * y)], -1),
        jnp.stack([2 * (x * y + qs * z), 1 - 2 * (x**2 + z**2), 2 * (y * z - qs * x)], -1),
        jnp.stack([2 * (x * z - qs * y), 2 * (y * z + qs * x), 1 - 2 * (x**2 + y**2)], -1),
    ], axis=-2)


def mrp_kinematics(p: Array, w: Array) -> Array:
    """ṗ = ¼ A(p) ω, A = (1+pᵀp)I + 2[p×]² + 2[p×]
    (Markley & Crassidis eq. 3.24; reference rexquad_utils.py:393-403)."""
    p0, p1, p2 = p[..., 0], p[..., 1], p[..., 2]
    A1 = jnp.stack([1 + p0**2 - p1**2 - p2**2, 2 * (p0 * p1 - p2), 2 * (p0 * p2 + p1)], -1)
    A2 = jnp.stack([2 * (p1 * p0 + p2), 1 - p0**2 + p1**2 - p2**2, 2 * (p1 * p2 - p0)], -1)
    A3 = jnp.stack([2 * (p2 * p0 - p1), 2 * (p2 * p1 + p0), 1 - p0**2 - p1**2 + p2**2], -1)
    A = jnp.stack([A1, A2, A3], axis=-2)
    return 0.25 * jnp.einsum("...ij,...j->...i", A, w,
                              precision=jax.lax.Precision.HIGHEST)


def euler_to_quat(roll: Array, pitch: Array, yaw: Array) -> Array:
    """XYZ Euler angles → quaternion (scalar-first)."""
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    return jnp.stack([
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
    ], axis=-1)
