"""Concrete environments (see envs.base for the functional API)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from diff_qp_mpc_tpu.envs.base import Env, EnvState, Spaces
from diff_qp_mpc_tpu.models import (
    Cartpole1L,
    Cartpole2L,
    Integrator,
    Pendulum,
    RexQuadrotor,
    angle_normalize,
)

Array = jnp.ndarray

__all__ = [
    "Env", "EnvState", "Spaces", "PendulumEnv", "IntegratorEnv",
    "Cartpole1LEnv", "Cartpole2LEnv", "QuadrotorEnv", "make_env",
]


class PendulumEnv(Env):
    """deqmpc/envs.py:84-179: θ from upright, swing-up or stabilization."""

    def __init__(self, stabilization: bool = False):
        self.model = Pendulum()
        self.stabilization = stabilization
        self.spec_id = "Pendulum-v0" + ("-stabilize" if stabilization else "")
        self.Qlqr = jnp.array([10.0, 1.0])
        self.Rlqr = jnp.array([0.01])
        self.observation_space = Spaces(
            -np.array([np.pi, np.inf]), np.array([np.pi, np.inf]))
        self.action_space = Spaces(
            -np.array([self.model.max_torque]), np.array([self.model.max_torque]))

    def _sample_init(self, key, bsz):
        high = jnp.array([0.05, 0.5] if self.stabilization else [np.pi, 1.0])
        return jax.random.uniform(key, (bsz, 2), minval=-high, maxval=high)

    def _success(self, x):
        return jnp.abs(angle_normalize(x[..., 0])) < 0.05

    def goal_error(self, x):
        return jnp.abs(angle_normalize(x[..., 0]))

    def _reward(self, x, u):
        return -(angle_normalize(x[..., 0]) ** 2)


class IntegratorEnv(Env):
    """deqmpc/envs.py:246-338."""

    def __init__(self, nx: int = 2, nu: int = 1, dt: float = 0.1,
                 max_acc: float = 2.0, max_vel: float = 2.0):
        self.model = Integrator(nx=nx, nu=nu, dt=dt, max_acc=max_acc,
                                max_vel=max_vel)
        self.spec_id = "Integrator-v0"
        self.Qlqr = jnp.array([10.0, 1.0] * (nx // 2))
        self.Rlqr = jnp.full((nu,), 0.01)
        low = np.concatenate([np.full(nx // 2, -np.inf), np.full(nx // 2, -max_vel)])
        self.observation_space = Spaces(low, -low)
        self.action_space = Spaces(np.full(nu, -max_acc), np.full(nu, max_acc))

    def _sample_init(self, key, bsz):
        nq = self.nq
        high = jnp.concatenate(
            [jnp.full((nq,), 2.0), jnp.full((nq,), self.model.max_vel)])
        return jax.random.uniform(key, (bsz, self.nx), minval=-high, maxval=high)

    def _success(self, x):
        return jnp.linalg.norm(x[..., : self.nq], axis=-1) < 0.01

    def goal_error(self, x):
        return jnp.linalg.norm(x[..., : self.nq], axis=-1)

    def _reward(self, x, u):
        pos, vel = x[..., : self.nq], x[..., self.nq:]
        return -(jnp.linalg.norm(pos, axis=-1) + jnp.linalg.norm(vel, axis=-1)
                 + jnp.linalg.norm(u, axis=-1))


class _CartpoleEnvBase(Env):
    """Swing-up/stabilize cartpole (my_envs/cartpole.py:40-205 semantics;
    our pole angles are measured from DOWN, so upright is θ = π)."""

    def __init__(self, stabilization: bool, init_scale: float = 1.0):
        self.stabilization = stabilization
        # widens the initial-state sampling box (reference envs expose the
        # same knob informally by editing the reset ranges; used by datagen
        # to cover the policy's capture basin with stabilize expert data)
        self.init_scale = init_scale
        nq = self.model.nq
        high = np.concatenate([np.full(nq, np.pi), np.full(nq, np.pi * 5)])
        self.observation_space = Spaces(-high, high)
        self.action_space = Spaces(
            np.full(1, -self.u_bounds), np.full(1, self.u_bounds))
        self.Qlqr = jnp.ones((self.nx,))
        self.Rlqr = jnp.full((self.nu,), 1e-8)
        # goal: cart at 0, every link straight UP, at rest. Joint angles
        # after the first are RELATIVE (models/cartpole.py Cartpole2L), so
        # the all-links-up configuration is θ = (π, 0, ...), matching the
        # reference's 2-link success set — my_envs/cartpole.py:2 ("at
        # upright all joint angles are 0" in its from-up convention) and
        # :244-255 (done() checks both joints near 0 mod 2π). Until r4
        # this goal was (π, π, ...), which under a relative second joint
        # folds link 2 back DOWN — a different, easier equilibrium.
        self.goal = jnp.concatenate([
            jnp.zeros((1,)), jnp.array([np.pi]), jnp.zeros((nq - 2,)),
            jnp.zeros((nq,))])

    def _delta_upright(self, x):
        # absolute link angles = cumulative sum of the relative joint
        # angles; every link must point up (abs angle π from down)
        nq = self.nq
        th_abs = jnp.cumsum(x[..., 1:nq], axis=-1)
        return jnp.max(jnp.abs(angle_normalize(th_abs - np.pi)), axis=-1)

    def _sample_init(self, key, bsz):
        nq = self.nq
        if self.stabilization:
            high = self.init_scale * jnp.concatenate(
                [jnp.array([0.1]), jnp.full((nq - 1,), 0.05), jnp.full((nq,), 0.05)])
            offset = jnp.concatenate(
                [jnp.zeros((1,)), jnp.array([np.pi]), jnp.zeros((nq - 2,)),
                 jnp.zeros((nq,))])
            return offset + jax.random.uniform(
                key, (bsz, self.nx), minval=-high, maxval=high)
        high = jnp.concatenate([jnp.full((nq,), np.pi), jnp.full((nq,), np.pi)])
        return jax.random.uniform(key, (bsz, self.nx), minval=-high, maxval=high)

    def _success(self, x):
        return self._delta_upright(x) < 0.05

    def goal_error(self, x):
        return self._delta_upright(x)

    def _reward(self, x, u):
        cart = jnp.abs(x[..., 0])
        return -(self._delta_upright(x) + cart + (cart > 10) * 80.0)

    def _diverged(self, x):
        # cart runaway / velocity blow-up is unrecoverable within the force
        # budget; cutting these keeps RL replay distributions sane
        nq = self.nq
        return (super()._diverged(x) | (jnp.abs(x[..., 0]) > 15.0)
                | (jnp.abs(x[..., nq:]) > 40.0).any(axis=-1))


class Cartpole1LEnv(_CartpoleEnvBase):
    def __init__(self, stabilization: bool = False, dt: float = 0.05,
                 init_scale: float = 1.0):
        self.model = Cartpole1L(dt=dt, max_force=100.0)
        self.u_bounds = 100.0
        self.max_steps = 200
        self.spec_id = "Cartpole1l-v0" + ("-stabilize" if stabilization else "")
        super().__init__(stabilization, init_scale)


class Cartpole2LEnv(_CartpoleEnvBase):
    def __init__(self, stabilization: bool = False, dt: float = 0.05,
                 init_scale: float = 1.0):
        # the reference's LIVE cp2 training robot (the CasADi C package —
        # my_envs/cartpole.py:27-38 selects it by nx; u_bounds 250 per
        # my_envs/cartpole.py:62), decoded exactly in models/cartpole.py
        self.model = Cartpole2L.pkg(dt=dt, max_force=250.0)
        self.u_bounds = 250.0
        self.max_steps = 300
        self.spec_id = "Cartpole2l-v0" + ("-stabilize" if stabilization else "")
        super().__init__(stabilization, init_scale)


class QuadrotorEnv(Env):
    """Hover task (rex_quadrotor.py:147-226 env half): random initial pose,
    target = level hover at the origin, nan/divergence auto-reset via
    Env.reset_where."""

    def __init__(self):
        self.model = RexQuadrotor()
        self.spec_id = "RexQuadrotor-v0"
        self.max_steps = 100
        self.Qlqr = jnp.concatenate([
            jnp.full((3,), 10.0), jnp.full((3,), 1.0),
            jnp.full((3,), 1.0), jnp.full((3,), 1.0)])
        self.Rlqr = jnp.full((4,), 0.01)
        self.observation_space = Spaces(np.full(12, -np.inf), np.full(12, np.inf))
        self.action_space = Spaces(np.full(4, 0.0), np.full(4, 20.0))

    def _sample_init(self, key, bsz):
        ks = jax.random.split(key, 4)
        r = jax.random.uniform(ks[0], (bsz, 3), minval=-1.0, maxval=1.0)
        m = 0.1 * jax.random.normal(ks[1], (bsz, 3))
        v = 0.2 * jax.random.normal(ks[2], (bsz, 3))
        w = 0.1 * jax.random.normal(ks[3], (bsz, 3))
        return jnp.concatenate([r, m, v, w], axis=-1)

    def _success(self, x):
        return jnp.linalg.norm(x[..., :3], axis=-1) < 0.05

    def goal_error(self, x):
        return jnp.linalg.norm(x[..., :3], axis=-1)

    def _reward(self, x, u):
        return -(jnp.linalg.norm(x[..., :3], axis=-1)
                 + 0.1 * jnp.linalg.norm(x[..., 6:9], axis=-1))


def make_env(name: str, **kwargs) -> Env:
    """Env registry by spec-style name (reference selects by --env flag,
    deqmpc/train.py:85-112)."""
    table = {
        "pendulum": PendulumEnv,
        "integrator": IntegratorEnv,
        "cartpole1link": Cartpole1LEnv,
        "cartpole2link": Cartpole2LEnv,
        "rexquadrotor": QuadrotorEnv,
    }
    if name not in table:
        raise ValueError(f"unknown env '{name}' (have {sorted(table)})")
    return table[name](**kwargs)
