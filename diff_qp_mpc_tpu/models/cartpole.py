"""1-link and 2-link cartpole dynamics via the Lagrangian engine.

Capability parity with the reference's analytic torch models
(deqmpc/envs_v1.py:28-94 OneLinkCartpoleDynamics, :226-321
TwoLinkCartpoleDynamics — the latter hardcodes expressions generated for
M=5, m₁=m₂=1, l₁=l₂=1 from the OpenOCL double-cartpole tutorial) and the
CasADi packages (deqmpc/my_envs/cartpole1l, cartpole2l). Here both are
*parameterized* models derived automatically from their energies
(models.lagrangian), RK4-integrated like the reference.

Conventions (matching envs_v1): pole angles measured from the DOWNWARD
vertical, anticlockwise positive; upright is θ = π. Point masses at link
ends. Control is a horizontal force on the cart.
"""
from __future__ import annotations

import jax.numpy as jnp

from diff_qp_mpc_tpu.models.base import DynamicsModel, rk4
from diff_qp_mpc_tpu.models.lagrangian import lagrangian_ode, lagrangian_ode_parts

Array = jnp.ndarray


class Cartpole1L(DynamicsModel):
    """State (x, θ, ẋ, θ̇); reference params envs_v1.py:35-40
    (dt=0.01, max_force=500, M=0.5, m=0.2, l=0.5, g=9.81)."""

    def __init__(self, dt: float = 0.01, M: float = 0.5, m: float = 0.2,
                 l: float = 0.5, g: float = 9.81, max_force: float = 500.0):
        self.dt = dt
        self.M = M
        self.m = m
        self.l = l
        self.g = g
        self.max_force = max_force
        self.nx = 4
        self.nu = 1
        self.nq = 2

        M_, m_, l_, g_ = M, m, l, g

        def kinetic(q, qd):
            xd, thd = qd[0], qd[1]
            th = q[1]
            # pole end-point velocity: (ẋ + l θ̇ cosθ, l θ̇ sinθ)
            v2 = xd**2 + (l_ * thd) ** 2 + 2 * l_ * thd * xd * jnp.cos(th)
            return 0.5 * M_ * xd**2 + 0.5 * m_ * v2

        def potential(q):
            # height of pole mass: −l cosθ (θ from downward)
            return -m_ * g_ * l_ * jnp.cos(q[1])

        def input_map(q, u):
            return jnp.concatenate([u, jnp.zeros(1, u.dtype)])

        self._ode = lagrangian_ode(kinetic, potential, input_map)
        self._ode_parts = lagrangian_ode_parts(
            kinetic, potential,
            lambda q, u: (u[0], q[0] * 0.0), self.nq)

    def step(self, x: Array, u: Array) -> Array:
        return rk4(self._ode, x, u, self.dt)

    def step_parts(self, xs, us):
        """Coordinate-wise step for the fused Pallas kernels (tuples of
        batch tiles in/out; see lagrangian.manipulator_accel_parts)."""
        from diff_qp_mpc_tpu.models.quadrotor import _parts_rk4

        return _parts_rk4(self._ode_parts, xs, us, self.dt)

    def action_clip(self, u: Array) -> Array:
        return jnp.clip(u, -self.max_force, self.max_force)

    def state_clip(self, x: Array) -> Array:
        """Wrap the pole angle to [0, 2π) (reference envs_v1.py:91-93
        state_clip via angle_normalize_2pi)."""
        from diff_qp_mpc_tpu.models.base import angle_normalize_2pi

        return x.at[..., 1].set(angle_normalize_2pi(x[..., 1]))

    def __hash__(self):
        return hash((type(self), self.dt, self.M, self.m, self.l, self.g))


class Cartpole2L(DynamicsModel):
    """State (x, θ₁, θ₂, ẋ, θ̇₁, θ̇₂), θ from DOWN, θ₂ relative to link 1.

    The reference ships TWO distinct 2-link cartpoles; both are decoded
    here exactly (round-4 fit, max qdd err ≤ 6e-6 on random states):

    - default (``com=0.5, link_inertia=0``): the analytic torch model
      `envs_v1.py:226-330` — point masses at link MIDPOINTS, cart M=5,
      m₁=m₂=1, l₁=l₂=1, g=9.81, RK4. (envs_v1 measures angles from
      horizontal with upright = π/2; the from-down form here is the same
      dynamics under θ = a + π/2, verified to 1.4e-13.)
    - ``Cartpole2L.pkg()`` (``M=10, com=1, link_inertia=1``): the CasADi
      C package `my_envs/cartpole2l/src/generated_dynamics.c` — the
      reference's LIVE cp2 training env (my_envs/cartpole.py:27-38
      selects it) — point mass 1 at each link TIP plus rotational
      inertia m·l² about the link's absolute angle, cart M=10, RK4
      (integrator identified to 1e-16). Until round 4 this class used
      tip masses with M=5, which matched NEITHER reference model.
    """

    def __init__(self, dt: float = 0.05, M: float = 5.0, m1: float = 1.0,
                 m2: float = 1.0, l1: float = 1.0, l2: float = 1.0,
                 g: float = 9.81, max_force: float = 500.0,
                 com: float = 0.5, link_inertia: float = 0.0):
        self.dt = dt
        self.M = M
        self.m1 = m1
        self.m2 = m2
        self.l1 = l1
        self.l2 = l2
        self.g = g
        self.max_force = max_force
        self.com = com
        self.link_inertia = link_inertia
        self.nx = 6
        self.nu = 1
        self.nq = 3

        M_, m1_, m2_, l1_, l2_, g_ = M, m1, m2, l1, l2, g
        r1_, r2_ = com * l1, com * l2          # mass point along each link
        I1_ = I2_ = link_inertia               # about the ABSOLUTE rate

        def kinetic(q, qd):
            th1, th2 = q[1], q[2]
            xd, w1, w2 = qd[0], qd[1], qd[2]
            w12 = w1 + w2  # absolute rate of link 2
            # link-1 mass-point velocity (at r1 along the link)
            v1x = xd + r1_ * w1 * jnp.cos(th1)
            v1y = r1_ * w1 * jnp.sin(th1)
            # joint-2 carrier (link-1 tip, full length)
            t1x = xd + l1_ * w1 * jnp.cos(th1)
            t1y = l1_ * w1 * jnp.sin(th1)
            # link-2 mass-point velocity
            v2x = t1x + r2_ * w12 * jnp.cos(th1 + th2)
            v2y = t1y + r2_ * w12 * jnp.sin(th1 + th2)
            return (0.5 * M_ * xd**2
                    + 0.5 * m1_ * (v1x**2 + v1y**2)
                    + 0.5 * m2_ * (v2x**2 + v2y**2)
                    + 0.5 * I1_ * w1**2 + 0.5 * I2_ * w12**2)

        def potential(q):
            th1, th2 = q[1], q[2]
            h1 = -r1_ * jnp.cos(th1)
            h2 = -l1_ * jnp.cos(th1) - r2_ * jnp.cos(th1 + th2)
            return g_ * (m1_ * h1 + m2_ * h2)

        def input_map(q, u):
            return jnp.concatenate([u, jnp.zeros(2, u.dtype)])

        self._ode = lagrangian_ode(kinetic, potential, input_map)
        self._ode_parts = lagrangian_ode_parts(
            kinetic, potential,
            lambda q, u: (u[0], q[0] * 0.0, q[0] * 0.0), self.nq)

    @classmethod
    def pkg(cls, dt: float = 0.05, max_force: float = 500.0):
        """The reference's live cp2 robot (CasADi C package), exactly."""
        return cls(dt=dt, M=10.0, com=1.0, link_inertia=1.0,
                   max_force=max_force)

    def step(self, x: Array, u: Array) -> Array:
        return rk4(self._ode, x, u, self.dt)

    def step_parts(self, xs, us):
        """Coordinate-wise step for the fused Pallas kernels."""
        from diff_qp_mpc_tpu.models.quadrotor import _parts_rk4

        return _parts_rk4(self._ode_parts, xs, us, self.dt)

    def action_clip(self, u: Array) -> Array:
        return jnp.clip(u, -self.max_force, self.max_force)

    def state_clip(self, x: Array) -> Array:
        """Wrap θ₁ to [0, 2π) and θ₂ to [−π, π).

        The reference wraps BOTH joints to [0, 2π)
        (envs_v1.py:319-321, my_envs/cartpole.py:89-90) — but its own
        task goal (both links up = θ₂ ≡ 0 for the relative second
        joint) sits EXACTLY on that branch seam, which is why its
        done()/reward must take a min over all four {0, 2π}² corner
        combinations (my_envs/cartpole.py:244-275) and why any
        quadratic tracking cost centered at the goal sees a ≈2π error
        the moment θ₂ dips negative — the solver then plans a
        catastrophic full-circle 'correction' (round-5 diagnosis: this
        single seam destabilized every closed-loop cp2 rollout through
        env.step while the identical solver stepping the raw model was
        64/64). The wrap branch is a representation choice on the same
        circle quotient; centering θ₂'s branch on its goal value
        removes the seam without changing which physical states exist.
        θ₁ (goal π, mid-branch) keeps the reference's [0, 2π)."""
        from diff_qp_mpc_tpu.models.base import (angle_normalize,
                                                 angle_normalize_2pi)

        x = x.at[..., 1].set(angle_normalize_2pi(x[..., 1]))
        return x.at[..., 2].set(angle_normalize(x[..., 2]))

    def __hash__(self):
        return hash((type(self), self.dt, self.M, self.m1, self.m2,
                     self.l1, self.l2, self.g, self.com, self.link_inertia))


class CartpoleCosSin(DynamicsModel):
    """Legacy 5-state (x, ẋ, cosθ, sinθ, θ̇) cartpole, the qpth env_dx
    encoding (qpth/env_dx/cartpole.py:28-96): classic Gym cartpole physics
    (half-pole 4/3 moment factor), Euler integration, θ from upright."""

    def __init__(self, dt: float = 0.05, g: float = 9.8, masscart: float = 1.0,
                 masspole: float = 0.1, length: float = 0.5,
                 force_mag: float = 100.0):
        self.dt = dt
        self.g = g
        self.masscart = masscart
        self.masspole = masspole
        self.length = length
        self.force_mag = force_mag
        self.nx = 5
        self.nu = 1
        self.nq = 3

    def step(self, x: Array, u: Array) -> Array:
        g, mc, mp, l = self.g, self.masscart, self.masspole, self.length
        total = mc + mp
        pml = mp * l
        f = jnp.clip(u[..., 0], -self.force_mag, self.force_mag)
        pos, dpos, cos_th, sin_th, dth = (x[..., 0], x[..., 1], x[..., 2],
                                          x[..., 3], x[..., 4])
        th = jnp.arctan2(sin_th, cos_th)
        cart_in = (f + pml * dth**2 * sin_th) / total
        th_acc = (g * sin_th - cos_th * cart_in) / (
            l * (4.0 / 3.0 - mp * cos_th**2 / total))
        x_acc = cart_in - pml * th_acc * cos_th / total
        pos = pos + self.dt * dpos
        dpos = dpos + self.dt * x_acc
        th = th + self.dt * dth
        dth = dth + self.dt * th_acc
        return jnp.stack([pos, dpos, jnp.cos(th), jnp.sin(th), dth], axis=-1)

    def step_parts(self, xs, us):
        """Coordinate-wise step for whole-solver Pallas kernels."""
        g, mc, mp, l = self.g, self.masscart, self.masspole, self.length
        total = mc + mp
        pml = mp * l
        pos, dpos, cos_th, sin_th, dth = xs
        f = jnp.clip(us[0], -self.force_mag, self.force_mag)
        th = jnp.arctan2(sin_th, cos_th)
        cart_in = (f + pml * dth**2 * sin_th) / total
        th_acc = (g * sin_th - cos_th * cart_in) / (
            l * (4.0 / 3.0 - mp * cos_th**2 / total))
        x_acc = cart_in - pml * th_acc * cos_th / total
        pos = pos + self.dt * dpos
        dpos = dpos + self.dt * x_acc
        th = th + self.dt * dth
        dth = dth + self.dt * th_acc
        return (pos, dpos, jnp.cos(th), jnp.sin(th), dth)

    def action_clip(self, u: Array) -> Array:
        return jnp.clip(u, -self.force_mag, self.force_mag)

    def __hash__(self):
        return hash((type(self), self.dt, self.g, self.masscart,
                     self.masspole, self.length))
