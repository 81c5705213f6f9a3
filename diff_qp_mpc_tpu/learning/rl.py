"""PPO expert training, JAX-native (the deqmpc/ppo_train.py slot).

The reference ships torch PPO/SAC/CGAC infrastructure but only *uses* it to
load pre-trained checkpoints for expert-data generation
(datagen.py:145-276). Here: a compact, fully-jitted PPO (clipped surrogate
+ GAE) over the functional envs — rollouts are a lax.scan over env.step,
so collection + update is one XLA program per iteration. Trained policies
plug into learning/datagen via ``ppo_expert_rollouts``.

Usage:
    python -m diff_qp_mpc_tpu.learning.rl --env pendulum --iters 300 \
        --platform cpu
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from diff_qp_mpc_tpu.envs import make_env
from diff_qp_mpc_tpu.envs.base import EnvState

Array = jnp.ndarray


class ActorCritic(nn.Module):
    """Gaussian actor + value head (reference GaussianPolicy family,
    ppo_train.py:213-260, sized down)."""

    nu: int
    hdim: int = 128

    @nn.compact
    def __call__(self, x: Array):
        h = nn.tanh(nn.Dense(self.hdim)(x))
        h = nn.tanh(nn.Dense(self.hdim)(h))
        mean = nn.Dense(self.nu)(h)
        log_std = self.param("log_std", nn.initializers.constant(-0.5),
                             (self.nu,))
        v = nn.Dense(1)(nn.tanh(nn.Dense(self.hdim)(x)))[..., 0]
        return mean, log_std, v


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    n_envs: int = 64
    rollout_len: int = 128
    epochs: int = 4
    minibatches: int = 8
    gamma: float = 0.99
    lam: float = 0.95
    clip: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    lr: float = 3e-4
    max_grad_norm: float = 0.5
    # returns of these envs are O(100) negative; scaling keeps the value
    # loss from drowning the policy gradient early
    reward_scale: float = 0.05


class Transition(NamedTuple):
    obs: Array
    action: Array
    logp: Array
    value: Array
    reward: Array
    done: Array


def make_ppo(env, cfg: PPOConfig):
    net = ActorCritic(nu=env.nu)
    act_scale = jnp.asarray(env.action_space.high, jnp.float32)

    def policy_sample(params, obs, key):
        mean, log_std, v = net.apply(params, obs)
        std = jnp.exp(log_std)
        eps = jax.random.normal(key, mean.shape)
        a = mean + std * eps
        logp = -0.5 * jnp.sum(((a - mean) / std) ** 2 + 2 * log_std
                              + jnp.log(2 * jnp.pi), axis=-1)
        return a, logp, v

    def logp_of(params, obs, action):
        mean, log_std, v = net.apply(params, obs)
        std = jnp.exp(log_std)
        logp = -0.5 * jnp.sum(((action - mean) / std) ** 2 + 2 * log_std
                              + jnp.log(2 * jnp.pi), axis=-1)
        ent = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
        return logp, v, ent

    def collect(params, env_state: EnvState, key):
        """lax.scan rollout with auto-reset."""

        def step(carry, _):
            env_state, key = carry
            key, k_act, k_reset = jax.random.split(key, 3)
            obs = env_state.x
            a, logp, v = policy_sample(params, obs, k_act)
            u = jnp.tanh(a) * act_scale  # squash to action space
            env_state2, reward, done = env.step(env_state, u)
            env_state2 = env.reset_where(k_reset, env_state2, done)
            return (env_state2, key), Transition(
                obs=obs, action=a, logp=logp, value=v,
                reward=cfg.reward_scale * reward,
                done=done.astype(jnp.float32))

        (env_state, key), traj = jax.lax.scan(
            step, (env_state, key), None, length=cfg.rollout_len)
        _, _, last_v = net.apply(params, env_state.x)
        return env_state, key, traj, last_v

    def gae(traj: Transition, last_v):
        def back(carry, tr):
            adv_next, v_next = carry
            nonterm = 1.0 - tr.done
            delta = tr.reward + cfg.gamma * v_next * nonterm - tr.value
            adv = delta + cfg.gamma * cfg.lam * nonterm * adv_next
            return (adv, tr.value), adv

        _, advs = jax.lax.scan(back, (jnp.zeros_like(last_v), last_v),
                               traj, reverse=True)
        returns = advs + traj.value
        return advs, returns

    def update(params, opt_state, optimizer, traj, advs, returns, key):
        B = cfg.rollout_len * cfg.n_envs
        flat = jax.tree.map(lambda a: a.reshape((B,) + a.shape[2:]), traj)
        advs = advs.reshape(B)
        advs = (advs - advs.mean()) / (advs.std() + 1e-8)
        returns = returns.reshape(B)

        def loss_fn(params, idx):
            obs = flat.obs[idx]
            logp, v, ent = logp_of(params, obs, flat.action[idx])
            ratio = jnp.exp(logp - flat.logp[idx])
            a = advs[idx]
            pg = -jnp.minimum(
                ratio * a,
                jnp.clip(ratio, 1 - cfg.clip, 1 + cfg.clip) * a).mean()
            vf = jnp.mean((v - returns[idx]) ** 2)
            return pg + cfg.vf_coef * vf - cfg.ent_coef * ent

        def epoch(carry, key_e):
            params, opt_state = carry
            perm = jax.random.permutation(key_e, B)

            def mb(carry, idx):
                params, opt_state = carry
                loss, g = jax.value_and_grad(loss_fn)(params, idx)
                updates, opt_state = optimizer.update(g, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            idxs = perm.reshape(cfg.minibatches, B // cfg.minibatches)
            (params, opt_state), losses = jax.lax.scan(
                mb, (params, opt_state), idxs)
            return (params, opt_state), losses.mean()

        keys = jax.random.split(key, cfg.epochs)
        (params, opt_state), losses = jax.lax.scan(
            epoch, (params, opt_state), keys)
        return params, opt_state, losses.mean()

    return net, policy_sample, collect, gae, update


def train_ppo(env, cfg: PPOConfig = PPOConfig(), iters: int = 300,
              seed: int = 0, log_every: int = 20):
    net, policy_sample, collect, gae, update = make_ppo(env, cfg)
    key = jax.random.PRNGKey(seed)
    key, k_init, k_reset = jax.random.split(key, 3)
    params = net.init(k_init, jnp.zeros((1, env.nx)))
    optimizer = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.lr))
    opt_state = optimizer.init(params)
    env_state = env.reset(k_reset, cfg.n_envs)

    @jax.jit
    def iteration(params, opt_state, env_state, key):
        env_state, key, traj, last_v = collect(params, env_state, key)
        advs, returns = gae(traj, last_v)
        key, k_up = jax.random.split(key)
        params, opt_state, loss = update(
            params, opt_state, optimizer, traj, advs, returns, k_up)
        return params, opt_state, env_state, key, loss, traj.reward.mean()

    for i in range(iters):
        params, opt_state, env_state, key, loss, mean_r = iteration(
            params, opt_state, env_state, key)
        if i % log_every == 0:
            print(f"iter {i:4d} loss {float(loss):+.4f} "
                  f"mean_step_reward {float(mean_r):+.4f}")
    return params, net


def ppo_expert_rollouts(env, params, net, num_traj: int, max_steps: int = 200,
                        seed: int = 0):
    """Deterministic (mean-action) expert rollouts in the reference pickle
    format (the get_*_expert_traj_{ppo,sac} role, datagen.py:145-276)."""
    act_scale = jnp.asarray(env.action_space.high, jnp.float32)

    @jax.jit
    def act(params, obs):
        mean, _, _ = net.apply(params, obs)
        return jnp.tanh(mean) * act_scale

    state = env.reset(jax.random.PRNGKey(seed), num_traj)
    xs, us, dones = [], [], []
    ever = np.zeros(num_traj, bool)
    for _ in range(max_steps):
        u = act(params, state.x)
        xs.append(np.asarray(state.x, np.float32))
        us.append(np.asarray(u, np.float32))
        state, _, done = env.step(state, u)
        ever |= np.asarray(done)
        dones.append(ever.copy())
        if ever.all():
            break
    trajs = []
    for b in range(num_traj):
        end = len(xs)
        for t in range(len(xs)):
            if dones[t][b]:
                end = t + 1
                break
        trajs.append([(xs[t][b], us[t][b]) for t in range(end)])
    return trajs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="pendulum")
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--save_data", type=str, default=None,
                   help="write expert pickle after training")
    p.add_argument("--num_traj", type=int, default=100)
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    env = make_env(args.env)
    params, net = train_ppo(env, iters=args.iters, seed=args.seed)
    if args.save_data:
        from diff_qp_mpc_tpu.learning.data import save_expert_pickle

        trajs = ppo_expert_rollouts(env, params, net, args.num_traj)
        save_expert_pickle(args.save_data, trajs)
        print(f"wrote {len(trajs)} expert trajectories to {args.save_data}")


if __name__ == "__main__":
    main()
