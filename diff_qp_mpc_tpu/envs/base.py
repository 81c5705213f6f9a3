"""Functional batched environments.

Gym-like capability parity with the reference env wrappers
(deqmpc/envs.py:84-179 PendulumEnv/IntegratorEnv, deqmpc/envs_v1.py env
classes, deqmpc/my_envs/cartpole.py:40-205, deqmpc/rex_quadrotor.py env
half): reset / step / reward / is_done, observation/action Spaces, LQR
weights Qlqr/Rlqr, spec_id, success counters and step limits.

JAX-native restructuring: environments are *stateless* objects; all
mutable state (x, success counter, step counter) lives in an ``EnvState``
pytree and randomness comes from explicit PRNG keys, so envs vmap/scan/
shard like everything else. Everything is batched: state is [bsz, nx].
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diff_qp_mpc_tpu.core.types import _pytree_dataclass
from diff_qp_mpc_tpu.models.base import DynamicsModel

Array = jnp.ndarray


@_pytree_dataclass
class EnvState:
    x: Array  # [bsz, nx]
    num_successes: Array  # [bsz] int32
    steps: Array  # [bsz] int32

    @staticmethod
    def make(x: Array) -> "EnvState":
        bsz = x.shape[0]
        return EnvState(
            x=x,
            num_successes=jnp.zeros((bsz,), jnp.int32),
            steps=jnp.zeros((bsz,), jnp.int32),
        )


class Spaces:
    """Box space (reference deqmpc/envs.py:59-66)."""

    def __init__(self, low, high, shape=None):
        self.low = np.asarray(low)
        self.high = np.asarray(high)
        self.shape = shape if shape is not None else self.low.shape

    def sample(self, key: Array) -> Array:
        return jax.random.uniform(
            key, self.low.shape,
            minval=jnp.asarray(self.low), maxval=jnp.asarray(self.high),
        )


class Env:
    """Base class; subclasses set model, spec_id, Qlqr, Rlqr and implement
    ``_sample_init``, ``_success``, ``_reward``."""

    model: DynamicsModel
    spec_id: str
    max_steps: int = 200
    success_streak: int = 10
    # set False to keep episodes running past the success streak (expert
    # data collection wants long goal-holding tails; streak-terminated
    # trajectories contain only success_streak-1 in-radius states, which
    # starves imitation of hold-phase data)
    terminate_on_success: bool = True

    @property
    def nx(self) -> int:
        return self.model.nx

    @property
    def nu(self) -> int:
        return self.model.nu

    @property
    def nq(self) -> int:
        return self.model.nq

    @property
    def dt(self) -> float:
        return self.model.dt

    @property
    def dynamics(self):
        return self.model

    # --- to implement ---
    def _sample_init(self, key: Array, bsz: int) -> Array:
        raise NotImplementedError

    def _success(self, x: Array) -> Array:  # [bsz] bool
        raise NotImplementedError

    def goal_error(self, x: Array) -> Array:  # [bsz] float
        """Continuous distance-to-goal of TRUE states — the noise-robust
        companion to the binary success-streak criterion: under obs noise
        comparable to the success radius the streak is unattainable by
        construction (r2 verdict weak #8) while this metric still ranks
        policies. NaN when an env defines no natural distance."""
        return jnp.full(x.shape[:-1], jnp.nan)

    def _reward(self, x: Array, u: Array) -> Array:  # [bsz]
        raise NotImplementedError

    def _diverged(self, x: Array) -> Array:  # [bsz] bool
        """Episodes to cut short as unrecoverable (the reference's
        nan/divergence auto-reset during collection,
        rex_quadrotor.py:195-220). Default: nonfinite states only."""
        return ~jnp.isfinite(x).all(axis=-1)

    # --- API ---
    def reset(self, key: Array, bsz: int) -> EnvState:
        return EnvState.make(self._sample_init(key, bsz))

    def step(self, state: EnvState, u: Array
             ) -> Tuple[EnvState, Array, Array]:
        """(state, action) -> (next_state, reward, done). Pure; jit/vmap-safe
        (reference pattern: my_envs/cartpole.py:141-166 with the success
        streak logic of envs.py:144-158)."""
        u = self.model.action_clip(u)
        x = self.model(state.x, u)
        x = self.model.state_clip(x)
        succ = self._success(x)
        num_successes = jnp.where(succ, state.num_successes + 1, 0)
        steps = state.steps + 1
        done = (steps >= self.max_steps) | self._diverged(x)
        if self.terminate_on_success:
            done = done | (num_successes >= self.success_streak)
        reward = self._reward(x, u)
        return EnvState(x=x, num_successes=num_successes, steps=steps), reward, done

    def reset_where(self, key: Array, state: EnvState, mask: Array) -> EnvState:
        """Re-sample the batch elements where ``mask`` is True (the
        auto-reset pattern used for batched data collection; reference
        nan/divergence reset, rex_quadrotor.py:195-220)."""
        fresh = self.reset(key, state.x.shape[0])
        pick = lambda a, b: jnp.where(
            mask.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
        return EnvState(
            x=pick(fresh.x, state.x),
            num_successes=pick(fresh.num_successes, state.num_successes),
            steps=pick(fresh.steps, state.steps),
        )
