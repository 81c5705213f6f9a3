"""RL expert training (PPO + SAC + CGAC), JAX-native (deqmpc/ppo_train.py slot).

The reference ships torch PPO/SAC/CGAC infrastructure but only *uses* it to
load pre-trained checkpoints for expert-data generation
(datagen.py:145-276); its swing-up experts are SAC/CGAC policies
(ppo_train.py:213-260 GaussianPolicy, :59-211 CGACGaussianPolicy +
CGACRunningMeanStd). Here all three are rebuilt fully-jitted:

* PPO — clipped surrogate + GAE; rollouts are a lax.scan over env.step, so
  collection + update is one XLA program per iteration.
* SAC — twin-Q soft actor-critic with automatic entropy tuning and the
  reference's tanh-squashed Gaussian actor (sample/log-prob semantics of
  ppo_train.py:239-254, incl. the action-bound log-det correction), a
  device-resident ring replay buffer, and an optional CGAC-style running
  mean/std observation normalizer (ppo_train.py:59-131). The whole
  (env-step → buffer insert → K gradient updates) block is a lax.scan, so
  thousands of SAC updates run as one XLA program.

Trained policies plug into learning/datagen via ``ppo_expert_rollouts`` /
``sac_expert_rollouts``.

Usage:
    python -m diff_qp_mpc_tpu.learning.rl --env pendulum --algo sac \
        --iters 30000 --platform cpu
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


# ---------------------------------------------------------------------------
# SAC (the reference's swing-up expert algorithm, ppo_train.py:213-260 +
# the soft-actor-critic trainer it loads checkpoints from)
# ---------------------------------------------------------------------------

LOG_SIG_MIN, LOG_SIG_MAX = -20.0, 2.0  # ppo_train.py clamp bounds


class GaussianActor(nn.Module):
    """Tanh-squashed Gaussian actor (reference GaussianPolicy,
    ppo_train.py:213-254): state-dependent mean/log_std, action rescaled by
    (high-low)/2 and biased by (high+low)/2."""

    nu: int
    hdim: int = 256

    @nn.compact
    def __call__(self, x: Array):
        h = nn.relu(nn.Dense(self.hdim)(x))
        h = nn.relu(nn.Dense(self.hdim)(h))
        mean = nn.Dense(self.nu)(h)
        log_std = jnp.clip(nn.Dense(self.nu)(h), LOG_SIG_MIN, LOG_SIG_MAX)
        return mean, log_std


class TwinQ(nn.Module):
    """Twin Q networks (standard SAC critic; the reference loads critics
    from the same pytorch-soft-actor-critic layout)."""

    hdim: int = 256

    @nn.compact
    def __call__(self, x: Array, u: Array):
        xu = jnp.concatenate([x, u], axis=-1)

        def q(xu):
            h = nn.relu(nn.Dense(self.hdim)(xu))
            h = nn.relu(nn.Dense(self.hdim)(h))
            return nn.Dense(1)(h)[..., 0]

        return q(xu), q(xu)


@dataclasses.dataclass(frozen=True)
class SACConfig:
    n_envs: int = 16
    buffer_size: int = 200_000
    batch_size: int = 256
    updates_per_iter: int = 8      # grad updates per vectorized env step
    gamma: float = 0.99
    tau: float = 0.005             # target-net Polyak rate
    lr: float = 3e-4
    warmup_steps: int = 1_000      # random-action transitions before training
    auto_alpha: bool = True        # automatic entropy-temperature tuning
    init_alpha: float = 0.2
    normalize_obs: bool = False    # CGAC-style running mean/std (ppo_train.py:59-131)
    reward_scale: float = 1.0      # buffer-side reward scaling; divergence
    # penalties of the cartpole-class envs put Q targets at O(1e4) without it
    block: int = 100               # iterations fused into one jitted scan


class SACState(NamedTuple):
    actor: any
    q: any
    q_targ: any
    log_alpha: Array
    opt_a: any
    opt_q: any
    opt_alpha: any
    # ring replay buffer (device-resident)
    buf_obs: Array
    buf_act: Array
    buf_rew: Array
    buf_next: Array
    buf_mask: Array
    ptr: Array
    size: Array
    # CGAC-style running obs statistics
    obs_mean: Array
    obs_var: Array
    obs_count: Array
    env_state: EnvState
    key: Array


def make_sac(env, cfg: SACConfig):
    actor_net = GaussianActor(nu=env.nu)
    q_net = TwinQ()
    lo = jnp.asarray(env.action_space.low, jnp.float32)
    hi = jnp.asarray(env.action_space.high, jnp.float32)
    act_scale = (hi - lo) / 2.0
    act_bias = (hi + lo) / 2.0
    target_entropy = -float(env.nu)
    opt = optax.adam(cfg.lr)

    def norm_obs(st: "SACState", obs):
        if not cfg.normalize_obs:
            return obs
        return jnp.clip((obs - st.obs_mean) / jnp.sqrt(st.obs_var + 1e-5),
                        -5.0, 5.0)

    def update_obs_stats(st: "SACState", batch_obs):
        """Chan/parallel-variance update (CGACRunningMeanStd.update)."""
        if not cfg.normalize_obs:
            return st
        bm = batch_obs.mean(0)
        bv = batch_obs.var(0)
        bc = batch_obs.shape[0]
        delta = bm - st.obs_mean
        tot = st.obs_count + bc
        new_mean = st.obs_mean + delta * bc / tot
        m2 = st.obs_var * st.obs_count + bv * bc + delta ** 2 * st.obs_count * bc / tot
        return st._replace(obs_mean=new_mean, obs_var=m2 / tot, obs_count=tot)

    def sample_action(actor_params, obs, key):
        """rsample + tanh squash + bound-corrected log-prob
        (ppo_train.py:239-254)."""
        mean, log_std = actor_net.apply(actor_params, obs)
        std = jnp.exp(log_std)
        x_t = mean + std * jax.random.normal(key, mean.shape)
        y_t = jnp.tanh(x_t)
        action = y_t * act_scale + act_bias
        logp = -0.5 * (((x_t - mean) / std) ** 2 + 2 * log_std
                       + jnp.log(2 * jnp.pi))
        logp = logp - jnp.log(act_scale * (1 - y_t ** 2) + 1e-6)
        return action, logp.sum(-1)

    def mean_action(actor_params, obs):
        mean, _ = actor_net.apply(actor_params, obs)
        return jnp.tanh(mean) * act_scale + act_bias

    def buffer_insert(st: "SACState", obs, act, rew, nxt, mask):
        n = obs.shape[0]
        idx = (st.ptr + jnp.arange(n)) % cfg.buffer_size
        return st._replace(
            buf_obs=st.buf_obs.at[idx].set(obs),
            buf_act=st.buf_act.at[idx].set(act),
            buf_rew=st.buf_rew.at[idx].set(rew),
            buf_next=st.buf_next.at[idx].set(nxt),
            buf_mask=st.buf_mask.at[idx].set(mask),
            ptr=(st.ptr + n) % cfg.buffer_size,
            size=jnp.minimum(st.size + n, cfg.buffer_size),
        )

    def grad_update(st: "SACState", key):
        k_idx, k_act, k_next = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (cfg.batch_size,), 0, st.size)
        obs = norm_obs(st, st.buf_obs[idx])
        nxt = norm_obs(st, st.buf_next[idx])
        act, rew, mask = st.buf_act[idx], st.buf_rew[idx], st.buf_mask[idx]
        alpha = jnp.exp(st.log_alpha)

        # critic update: soft Bellman target from target nets
        a2, logp2 = sample_action(st.actor, nxt, k_next)
        q1t, q2t = q_net.apply(st.q_targ, nxt, a2)
        target = rew + cfg.gamma * mask * (jnp.minimum(q1t, q2t) - alpha * logp2)
        target = jax.lax.stop_gradient(target)

        def q_loss_fn(q_params):
            q1, q2 = q_net.apply(q_params, obs, act)
            return jnp.mean((q1 - target) ** 2) + jnp.mean((q2 - target) ** 2)

        q_loss, gq = jax.value_and_grad(q_loss_fn)(st.q)
        upd, opt_q = opt.update(gq, st.opt_q, st.q)
        q_params = optax.apply_updates(st.q, upd)

        # actor update (reparameterized)
        def a_loss_fn(actor_params):
            a, logp = sample_action(actor_params, obs, k_act)
            q1, q2 = q_net.apply(q_params, obs, a)
            return jnp.mean(alpha * logp - jnp.minimum(q1, q2)), logp

        (a_loss, logp), ga = jax.value_and_grad(a_loss_fn, has_aux=True)(st.actor)
        upd, opt_a = opt.update(ga, st.opt_a, st.actor)
        actor_params = optax.apply_updates(st.actor, upd)

        # entropy temperature
        if cfg.auto_alpha:
            def alpha_loss_fn(log_alpha):
                return -jnp.mean(jnp.exp(log_alpha)
                                 * jax.lax.stop_gradient(logp + target_entropy))

            _, galpha = jax.value_and_grad(alpha_loss_fn)(st.log_alpha)
            upd, opt_alpha = opt.update(galpha, st.opt_alpha, st.log_alpha)
            log_alpha = optax.apply_updates(st.log_alpha, upd)
        else:
            log_alpha, opt_alpha = st.log_alpha, st.opt_alpha

        q_targ = jax.tree.map(lambda t, s: (1 - cfg.tau) * t + cfg.tau * s,
                              st.q_targ, q_params)
        return st._replace(actor=actor_params, q=q_params, q_targ=q_targ,
                           log_alpha=log_alpha, opt_a=opt_a, opt_q=opt_q,
                           opt_alpha=opt_alpha), (q_loss, a_loss)

    def env_step(st: "SACState", key, random_policy: bool):
        k_act, k_reset = jax.random.split(key)
        obs = st.env_state.x
        if random_policy:
            u = jax.random.uniform(k_act, (obs.shape[0], env.nu),
                                   minval=lo, maxval=hi)
        else:
            u, _ = sample_action(st.actor, norm_obs(st, obs), k_act)
        env2, reward, done = env.step(st.env_state, u)
        nxt = env2.x
        # infinite-horizon tasks: resets are time/success limits, not true
        # terminals — bootstrap through them (mask=1), as is standard for
        # gym Pendulum-style SAC
        mask = jnp.ones_like(reward)
        st = buffer_insert(st, obs, u, cfg.reward_scale * reward, nxt, mask)
        st = update_obs_stats(st, obs)
        env2 = env.reset_where(k_reset, env2, done)
        return st._replace(env_state=env2), reward.mean()

    def iteration(st: "SACState", _):
        key, k_step, k_upd = jax.random.split(st.key, 3)
        st = st._replace(key=key)
        st, mean_r = env_step(st, k_step, random_policy=False)

        def upd(st, k):
            return grad_update(st, k)

        st, losses = jax.lax.scan(upd, st,
                                  jax.random.split(k_upd, cfg.updates_per_iter))
        return st, (mean_r, losses[0].mean(), losses[1].mean())

    @functools.partial(jax.jit, static_argnums=())
    def train_block(st: "SACState"):
        return jax.lax.scan(iteration, st, None, length=cfg.block)

    @jax.jit
    def warmup_block(st: "SACState"):
        def it(st, _):
            key, k_step = jax.random.split(st.key)
            st = st._replace(key=key)
            st, r = env_step(st, k_step, random_policy=True)
            return st, r

        return jax.lax.scan(it, st, None,
                            length=max(1, cfg.warmup_steps // cfg.n_envs))

    def init_state(seed: int) -> SACState:
        key = jax.random.PRNGKey(seed)
        key, k_a, k_q, k_reset = jax.random.split(key, 4)
        obs0 = jnp.zeros((1, env.nx), jnp.float32)
        act0 = jnp.zeros((1, env.nu), jnp.float32)
        actor = actor_net.init(k_a, obs0)
        q = q_net.init(k_q, obs0, act0)
        log_alpha = jnp.asarray(jnp.log(cfg.init_alpha), jnp.float32)
        return SACState(
            actor=actor, q=q, q_targ=q,
            log_alpha=log_alpha,
            opt_a=opt.init(actor), opt_q=opt.init(q),
            opt_alpha=opt.init(log_alpha),
            buf_obs=jnp.zeros((cfg.buffer_size, env.nx), jnp.float32),
            buf_act=jnp.zeros((cfg.buffer_size, env.nu), jnp.float32),
            buf_rew=jnp.zeros((cfg.buffer_size,), jnp.float32),
            buf_next=jnp.zeros((cfg.buffer_size, env.nx), jnp.float32),
            buf_mask=jnp.zeros((cfg.buffer_size,), jnp.float32),
            ptr=jnp.zeros((), jnp.int32), size=jnp.zeros((), jnp.int32),
            obs_mean=jnp.zeros((env.nx,), jnp.float32),
            obs_var=jnp.ones((env.nx,), jnp.float32),
            obs_count=jnp.asarray(1e-4, jnp.float32),
            env_state=env.reset(k_reset, cfg.n_envs),
            key=key,
        )

    return actor_net, mean_action, norm_obs, init_state, warmup_block, train_block


def train_sac(env, cfg: SACConfig = SACConfig(), iters: int = 30_000,
              seed: int = 0, log_every: int = 2_000, eval_rollouts: int = 64,
              ckpt_path: str | None = None):
    """Train SAC; returns (actor_params, act_fn) where
    ``act_fn(params, obs) -> deterministic action`` (the reference's
    ``policy.sample(...)[2]`` mean action used for expert rollouts,
    datagen.py:255-262). ``ckpt_path`` saves (actor, obs stats) at every
    log point so long runs are not all-or-nothing."""
    (actor_net, mean_action, norm_obs, init_state, warmup_block,
     train_block) = make_sac(env, cfg)
    st = init_state(seed)
    st, _ = warmup_block(st)

    n_blocks = max(1, iters // cfg.block)
    for b in range(n_blocks):
        st, (mean_r, q_loss, a_loss) = train_block(st)
        if (b * cfg.block) % log_every < cfg.block:
            ep_r = evaluate_policy(
                env, lambda obs: mean_action(st.actor, norm_obs(st, obs)),
                n=eval_rollouts, seed=seed + b)
            print(f"iter {b * cfg.block:6d} step_r {float(mean_r[-1]):+8.4f} "
                  f"q_loss {float(q_loss[-1]):8.4f} a_loss {float(a_loss[-1]):+8.4f} "
                  f"alpha {float(jnp.exp(st.log_alpha)):.4f} "
                  f"eval_ep_r {ep_r:+9.2f}", flush=True)
            if ckpt_path is not None:
                from diff_qp_mpc_tpu.utils.checkpoint import save_checkpoint

                save_checkpoint(ckpt_path, {
                    "actor": st.actor, "obs_mean": st.obs_mean,
                    "obs_var": st.obs_var})

    final_st = st

    def act(obs):
        return mean_action(final_st.actor, norm_obs(final_st, obs))

    return st.actor, act


def evaluate_policy(env, act_fn, n: int = 64, seed: int = 0,
                    max_steps: int | None = None):
    """Mean episode return of a deterministic policy over n parallel envs."""
    steps = max_steps or env.max_steps
    state = env.reset(jax.random.PRNGKey(seed), n)
    total = jnp.zeros((n,))
    alive = jnp.ones((n,), bool)
    for _ in range(steps):
        u = act_fn(state.x)
        state, r, done = env.step(state, u)
        total = total + r * alive
        alive = alive & ~done
    return float(total.mean())


def sac_expert_rollouts(env, act_fn, num_traj: int = 300,
                        max_steps: int | None = None, seed: int = 0):
    """Deterministic SAC expert rollouts in the reference pickle format
    (get_expert_traj_sac role, datagen.py:231-276): ``num_traj``
    trajectories of (state, action) pairs, truncated at done."""
    steps = max_steps or env.max_steps
    state = env.reset(jax.random.PRNGKey(seed), num_traj)
    xs, us, dones = [], [], []
    ever = np.zeros(num_traj, bool)
    act_jit = jax.jit(act_fn)
    for _ in range(steps):
        u = act_jit(state.x)
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


# ---------------------------------------------------------------------------
# CGAC — Critic-Gradient based Actor Critic (the reference's third expert
# family). The reference ships ONLY the policy network and observation
# normalizer (ppo_train.py:131-211 CGACGaussianPolicy, :59-131
# CGACRunningMeanStd) and uses them to roll out externally-trained
# checkpoints (datagen.py:239-276, get_expert_traj_cgac; the checkpoint
# blobs themselves are stripped, .MISSING_LARGE_BLOBS). This trainer
# completes the component: the massively-parallel on-policy actor-critic
# recipe those classes come from (Gurumurthy et al., "Practical Critic
# Gradient based Actor Critic", L4DC 2023) —
#   * many parallel envs, one synchronized step per iteration (the role
#     of the reference's cgac_env.py PytorchEnv wrapper — isaacgym-style
#     obs/progress buffers with auto-reset, cgac_env.py:20-96 — here
#     native: Env.reset_where + the batched step);
#   * a SHORT on-policy FIFO buffer (the freshest window of transitions,
#     not SAC's uniform 200k replay);
#   * twin-Q critics with entropy-regularized TD targets;
#   * the actor improved through the critic's action gradient
#     (reparameterized ∂Q/∂a at sampled actions) with auto-tuned
#     temperature;
#   * always-on running mean/std observation normalization.
# Architecture parity with CGACGaussianPolicy is exact: ELU trunk
# [512, 256], mean + state-dependent log-std heads clamped to [-20, 2],
# tanh squash with the action-bound log-det correction
# (ppo_train.py:167-205).
# ---------------------------------------------------------------------------


class CGACActor(nn.Module):
    """CGACGaussianPolicy (ppo_train.py:131-175): ELU MLP trunk, mean head,
    clamped state-dependent log-std head."""

    nu: int
    hidden: tuple = (512, 256)

    @nn.compact
    def __call__(self, x: Array):
        h = x
        for w in self.hidden:
            h = nn.elu(nn.Dense(w)(h))
        mean = nn.Dense(self.nu)(h)
        log_std = jnp.clip(nn.Dense(self.nu)(h), -20.0, 2.0)
        return mean, log_std


@dataclasses.dataclass(frozen=True)
class CGACConfig:
    n_envs: int = 256            # parallel envs (paper: thousands on GPU)
    window: int = 16             # on-policy FIFO depth, in env steps
    batch_size: int = 1024
    updates_per_iter: int = 4
    gamma: float = 0.99
    tau: float = 0.005
    lr: float = 3e-4
    warmup_steps: int = 4        # env steps before training (fills window)
    init_alpha: float = 0.2
    reward_scale: float = 1.0
    block: int = 100


class CGACState(NamedTuple):
    actor: any
    q: any
    q_targ: any
    log_alpha: Array
    opt_a: any
    opt_q: any
    opt_alpha: any
    buf_obs: Array   # [window, n_envs, nx] on-policy FIFO
    buf_act: Array
    buf_rew: Array
    buf_next: Array
    filled: Array
    obs_mean: Array
    obs_var: Array
    obs_count: Array
    env_state: EnvState
    key: Array


def make_cgac(env, cfg: CGACConfig):
    actor_net = CGACActor(nu=env.nu)
    q_net = TwinQ()
    lo = jnp.asarray(env.action_space.low, jnp.float32)
    hi = jnp.asarray(env.action_space.high, jnp.float32)
    act_scale = (hi - lo) / 2.0
    act_bias = (hi + lo) / 2.0
    target_entropy = -float(env.nu)
    opt = optax.adam(cfg.lr)

    def norm_obs(st, obs):
        """CGACRunningMeanStd.forward (ppo_train.py:102-129): normalize,
        clamp to ±5."""
        return jnp.clip((obs - st.obs_mean) / jnp.sqrt(st.obs_var + 1e-5),
                        -5.0, 5.0)

    def update_obs_stats(st, batch_obs):
        """Chan parallel-moments update (ppo_train.py:84-100)."""
        bm, bv, bc = batch_obs.mean(0), batch_obs.var(0), batch_obs.shape[0]
        delta = bm - st.obs_mean
        tot = st.obs_count + bc
        new_mean = st.obs_mean + delta * bc / tot
        m2 = (st.obs_var * st.obs_count + bv * bc
              + delta ** 2 * st.obs_count * bc / tot)
        return st._replace(obs_mean=new_mean, obs_var=m2 / tot, obs_count=tot)

    def sample_action(actor_params, obs, key):
        """rsample + tanh + bound correction (ppo_train.py:187-205)."""
        mean, log_std = actor_net.apply(actor_params, obs)
        std = jnp.exp(log_std)
        x_t = mean + std * jax.random.normal(key, mean.shape)
        y_t = jnp.tanh(x_t)
        action = y_t * act_scale + act_bias
        logp = -0.5 * (((x_t - mean) / std) ** 2 + 2 * log_std
                       + jnp.log(2 * jnp.pi))
        logp = logp - jnp.log(act_scale * (1 - y_t ** 2) + 1e-6)
        return action, logp.sum(-1)

    def mean_action(actor_params, obs):
        mean, _ = actor_net.apply(actor_params, obs)
        return jnp.tanh(mean) * act_scale + act_bias

    def grad_update(st: "CGACState", key):
        k_idx, k_act, k_next = jax.random.split(key, 3)
        n_valid = st.filled * cfg.n_envs
        flat_idx = jax.random.randint(k_idx, (cfg.batch_size,), 0, n_valid)
        # the roll-append buffer stores valid transitions at the END
        # ([window-filled, window)); offset the time index so a part-full
        # window never samples its zero-initialized prefix
        t_idx = cfg.window - st.filled + flat_idx // cfg.n_envs
        e_idx = flat_idx % cfg.n_envs
        obs = norm_obs(st, st.buf_obs[t_idx, e_idx])
        nxt = norm_obs(st, st.buf_next[t_idx, e_idx])
        act = st.buf_act[t_idx, e_idx]
        rew = st.buf_rew[t_idx, e_idx]
        alpha = jnp.exp(st.log_alpha)

        a2, logp2 = sample_action(st.actor, nxt, k_next)
        q1t, q2t = q_net.apply(st.q_targ, nxt, a2)
        target = rew + cfg.gamma * (jnp.minimum(q1t, q2t) - alpha * logp2)
        target = jax.lax.stop_gradient(target)

        def q_loss_fn(q_params):
            q1, q2 = q_net.apply(q_params, obs, act)
            return jnp.mean((q1 - target) ** 2) + jnp.mean((q2 - target) ** 2)

        q_loss, gq = jax.value_and_grad(q_loss_fn)(st.q)
        upd, opt_q = opt.update(gq, st.opt_q, st.q)
        q_params = optax.apply_updates(st.q, upd)

        # critic-gradient actor step: ∂/∂θ E[min Q(s, ã(θ)) − α log π]
        # — gradients reach θ only through the action input of Q
        def a_loss_fn(actor_params):
            a, logp = sample_action(actor_params, obs, k_act)
            q1, q2 = q_net.apply(q_params, obs, a)
            return jnp.mean(alpha * logp - jnp.minimum(q1, q2)), logp

        (a_loss, logp), ga = jax.value_and_grad(a_loss_fn, has_aux=True)(st.actor)
        upd, opt_a = opt.update(ga, st.opt_a, st.actor)
        actor_params = optax.apply_updates(st.actor, upd)

        def alpha_loss_fn(log_alpha):
            return -jnp.mean(jnp.exp(log_alpha)
                             * jax.lax.stop_gradient(logp + target_entropy))

        _, galpha = jax.value_and_grad(alpha_loss_fn)(st.log_alpha)
        upd, opt_alpha = opt.update(galpha, st.opt_alpha, st.log_alpha)
        log_alpha = optax.apply_updates(st.log_alpha, upd)

        q_targ = jax.tree.map(lambda t, s: (1 - cfg.tau) * t + cfg.tau * s,
                              st.q_targ, q_params)
        return st._replace(actor=actor_params, q=q_params, q_targ=q_targ,
                           log_alpha=log_alpha, opt_a=opt_a, opt_q=opt_q,
                           opt_alpha=opt_alpha), (q_loss, a_loss)

    def env_step(st: "CGACState", key, random_policy: bool):
        k_act, k_reset = jax.random.split(key)
        obs = st.env_state.x
        if random_policy:
            u = jax.random.uniform(k_act, (obs.shape[0], env.nu),
                                   minval=lo, maxval=hi)
        else:
            u, _ = sample_action(st.actor, norm_obs(st, obs), k_act)
        env2, reward, done = env.step(st.env_state, u)
        # FIFO: roll the window, write the newest step at the end
        st = st._replace(
            buf_obs=jnp.concatenate([st.buf_obs[1:], obs[None]], 0),
            buf_act=jnp.concatenate([st.buf_act[1:], u[None]], 0),
            buf_rew=jnp.concatenate(
                [st.buf_rew[1:], (cfg.reward_scale * reward)[None]], 0),
            buf_next=jnp.concatenate([st.buf_next[1:], env2.x[None]], 0),
            filled=jnp.minimum(st.filled + 1, cfg.window),
        )
        st = update_obs_stats(st, obs)
        env2 = env.reset_where(k_reset, env2, done)
        return st._replace(env_state=env2), reward.mean()

    def iteration(st: "CGACState", _):
        key, k_step, k_upd = jax.random.split(st.key, 3)
        st = st._replace(key=key)
        st, mean_r = env_step(st, k_step, random_policy=False)
        st, losses = jax.lax.scan(lambda s, k: grad_update(s, k), st,
                                  jax.random.split(k_upd, cfg.updates_per_iter))
        return st, (mean_r, losses[0].mean(), losses[1].mean())

    @jax.jit
    def train_block(st: "CGACState"):
        return jax.lax.scan(iteration, st, None, length=cfg.block)

    @jax.jit
    def warmup_block(st: "CGACState"):
        def it(st, _):
            key, k_step = jax.random.split(st.key)
            st = st._replace(key=key)
            st, r = env_step(st, k_step, random_policy=True)
            return st, r

        return jax.lax.scan(it, st, None, length=max(1, cfg.warmup_steps))

    def init_state(seed: int) -> CGACState:
        key = jax.random.PRNGKey(seed)
        key, k_a, k_q, k_reset = jax.random.split(key, 4)
        obs0 = jnp.zeros((1, env.nx), jnp.float32)
        act0 = jnp.zeros((1, env.nu), jnp.float32)
        actor = actor_net.init(k_a, obs0)
        q = q_net.init(k_q, obs0, act0)
        log_alpha = jnp.asarray(jnp.log(cfg.init_alpha), jnp.float32)
        W, N = cfg.window, cfg.n_envs
        return CGACState(
            actor=actor, q=q, q_targ=q, log_alpha=log_alpha,
            opt_a=opt.init(actor), opt_q=opt.init(q),
            opt_alpha=opt.init(log_alpha),
            buf_obs=jnp.zeros((W, N, env.nx), jnp.float32),
            buf_act=jnp.zeros((W, N, env.nu), jnp.float32),
            buf_rew=jnp.zeros((W, N), jnp.float32),
            buf_next=jnp.zeros((W, N, env.nx), jnp.float32),
            filled=jnp.zeros((), jnp.int32),
            obs_mean=jnp.zeros((env.nx,), jnp.float32),
            obs_var=jnp.ones((env.nx,), jnp.float32),
            obs_count=jnp.asarray(1e-4, jnp.float32),
            env_state=env.reset(k_reset, N),
            key=key,
        )

    return (actor_net, mean_action, norm_obs, init_state, warmup_block,
            train_block)


def train_cgac(env, cfg: CGACConfig = CGACConfig(), iters: int = 30_000,
               seed: int = 0, log_every: int = 2_000, eval_rollouts: int = 64,
               ckpt_path: str | None = None):
    """Train CGAC; returns (actor_params, act_fn) with the deterministic
    mean action (reference rollout semantics: policy.sample(rms(obs))[2],
    datagen.py:252-259)."""
    (actor_net, mean_action, norm_obs, init_state, warmup_block,
     train_block) = make_cgac(env, cfg)
    st = init_state(seed)
    st, _ = warmup_block(st)

    n_blocks = max(1, iters // cfg.block)
    for b in range(n_blocks):
        st, (mean_r, q_loss, a_loss) = train_block(st)
        if (b * cfg.block) % log_every < cfg.block:
            ep_r = evaluate_policy(
                env, lambda obs: mean_action(st.actor, norm_obs(st, obs)),
                n=eval_rollouts, seed=seed + b)
            print(f"iter {b * cfg.block:6d} step_r {float(mean_r[-1]):+8.4f} "
                  f"q_loss {float(q_loss[-1]):8.4f} "
                  f"a_loss {float(a_loss[-1]):+8.4f} "
                  f"alpha {float(jnp.exp(st.log_alpha)):.4f} "
                  f"eval_ep_r {ep_r:+9.2f}", flush=True)
            if ckpt_path is not None:
                from diff_qp_mpc_tpu.utils.checkpoint import save_checkpoint

                save_checkpoint(ckpt_path, {
                    "actor": st.actor, "obs_mean": st.obs_mean,
                    "obs_var": st.obs_var})

    final_st = st

    def act(obs):
        return mean_action(final_st.actor, norm_obs(final_st, obs))

    return st.actor, act


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="pendulum")
    p.add_argument("--algo", type=str, default="ppo",
                   choices=["ppo", "sac", "cgac"])
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--save_data", type=str, default=None,
                   help="write expert pickle after training")
    p.add_argument("--num_traj", type=int, default=100)
    p.add_argument("--normalize_obs", action="store_true",
                   help="CGAC-style running mean/std obs normalization")
    p.add_argument("--reward_scale", type=float, default=1.0)
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    env = make_env(args.env)
    if args.algo == "cgac":
        cfg = CGACConfig(reward_scale=args.reward_scale)
        ckpt = (args.save_data + ".cgac_ckpt.msgpack"
                if args.save_data else None)
        _, act_fn = train_cgac(env, cfg, iters=args.iters, seed=args.seed,
                               ckpt_path=ckpt)
        if args.save_data:
            from diff_qp_mpc_tpu.learning.data import save_expert_pickle

            trajs = sac_expert_rollouts(env, act_fn, args.num_traj)
            save_expert_pickle(args.save_data, trajs)
            lens = [len(t) for t in trajs]
            print(f"wrote {len(trajs)} expert trajectories "
                  f"(len min/mean/max {min(lens)}/{np.mean(lens):.1f}/"
                  f"{max(lens)}) to {args.save_data}")
        return
    if args.algo == "sac":
        cfg = SACConfig(normalize_obs=args.normalize_obs,
                        reward_scale=args.reward_scale)
        ckpt = (args.save_data + ".sac_ckpt.msgpack"
                if args.save_data else None)
        _, act_fn = train_sac(env, cfg, iters=args.iters, seed=args.seed,
                              ckpt_path=ckpt)
        if args.save_data:
            from diff_qp_mpc_tpu.learning.data import save_expert_pickle

            trajs = sac_expert_rollouts(env, act_fn, args.num_traj)
            save_expert_pickle(args.save_data, trajs)
            lens = [len(t) for t in trajs]
            print(f"wrote {len(trajs)} expert trajectories "
                  f"(len min/mean/max {min(lens)}/{np.mean(lens):.1f}/"
                  f"{max(lens)}) to {args.save_data}")
        return

    params, net = train_ppo(env, iters=args.iters, seed=args.seed)
    if args.save_data:
        from diff_qp_mpc_tpu.learning.data import save_expert_pickle

        trajs = ppo_expert_rollouts(env, params, net, args.num_traj)
        save_expert_pickle(args.save_data, trajs)
        print(f"wrote {len(trajs)} expert trajectories to {args.save_data}")


if __name__ == "__main__":
    main()
