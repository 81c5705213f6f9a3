"""Closed-loop policy evaluation with observation noise.

Rebuild of deqmpc/test.py (the eval-time variant of train.py): roll a
trained DEQ-MPC policy closed-loop in the environment under the
observation-corruption modes (--test_noise_* flags, deqmpc/test.py:62-67),
and report success rate, mean reward, episode length, and tracking error.

Usage:
    python -m diff_qp_mpc_tpu.learning.evaluate --env integrator \
        --ckpt logs/<name>/ckpt.msgpack --episodes 64 --noise_type 1 \
        --noise_std 0.05
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from diff_qp_mpc_tpu.envs import make_env
from diff_qp_mpc_tpu.learning import noise as noise_mod
from diff_qp_mpc_tpu.learning.train import build_parser, make_policy
from diff_qp_mpc_tpu.utils.checkpoint import load_checkpoint


def evaluate_policy(env, policy, params, episodes: int = 64,
                    max_steps: int = 200, noise_type: int = 0,
                    noise_std: float = 0.0, noise_mean: float = 0.0,
                    seed: int = 0, deq: bool = True):
    """Batched closed-loop rollout; the policy's first planned action is
    applied each step (receding horizon)."""
    key = jax.random.PRNGKey(seed)
    k_reset, key = jax.random.split(key)
    state = env.reset(k_reset, episodes)

    @jax.jit
    def act(params, obs):
        if deq:
            iterates, _ = policy.apply(params, obs, qp_solve=True)
            return iterates[-1].actions[:, 0]
        states, actions = policy.apply(params, obs)
        if actions is not None:
            return actions[:, 0]
        raise ValueError("state-only policy cannot act closed-loop")

    total_reward = np.zeros(episodes)
    done_at = np.full(episodes, max_steps, np.int32)
    ever_done = np.zeros(episodes, bool)
    ever_success = np.zeros(episodes, bool)
    final_goal_err = np.full(episodes, np.nan)
    for t in range(max_steps):
        key, k_noise = jax.random.split(key)
        obs = noise_mod.corrupt_observation(
            k_noise, state.x[:, None, :], noise_type, noise_std, noise_mean
        )[:, 0]
        u = act(params, obs)
        state, reward, done = env.step(state, u)
        r = np.asarray(reward)
        # a diverging episode can emit NaN reward on its final live step
        # (NaN state before the divergence cut fires); keep the aggregate
        # finite and count the divergence instead
        r = np.where(np.isfinite(r), r, 0.0)
        d = np.asarray(done)
        # success = the env's success-streak termination, NOT the step
        # limit (done alone conflates the two)
        succ = np.asarray(state.num_successes >= env.success_streak)
        total_reward += r * (~ever_done)
        newly = d & ~ever_done
        done_at[newly] = t + 1
        # freeze the TRUE-state goal error at episode end (noise-robust
        # companion metric; see Env.goal_error) — also updated for
        # still-alive episodes so truncation records the last state
        ge = np.asarray(env.goal_error(state.x))
        # done-this-step episodes are still in ~ever_done here (ever_done
        # is OR-ed with d only below), so this covers live AND just-ended
        final_goal_err = np.where(~ever_done, ge, final_goal_err)
        ever_success |= (succ & ~ever_done)
        ever_done |= d
        if ever_done.all():
            break

    return {
        "success_rate": float(ever_success.mean()),
        "mean_reward": float(total_reward.mean()),
        "mean_episode_len": float(done_at.mean()),
        "median_final_goal_err": float(np.nanmedian(final_goal_err)),
        "episodes": episodes,
        "noise_type": noise_type,
    }


def main(argv=None):
    base = build_parser()  # includes --ckpt (shared with train's resume)
    base.add_argument("--episodes", type=int, default=64)
    base.add_argument("--max_steps", type=int, default=200)
    base.add_argument("--noise_type", type=int, default=0)
    base.add_argument("--noise_std", type=float, default=0.0)
    base.add_argument("--noise_mean", type=float, default=0.0)
    args = base.parse_args(argv)
    if args.ckpt is None:
        base.error("--ckpt is required for evaluation")

    # Prefer the checkpoint's own training config (<ckpt>.meta.json,
    # written by utils/checkpoint.py) for every policy-shaping field the
    # user did not explicitly pass: the DEQ equilibrium is tuned to the
    # training-time solver budget, so evaluating at a different qp_iter /
    # deq_iter silently degrades the policy (see RESULTS.md eval-budget
    # note). Explicit CLI flags still win.
    raw = list(argv) if argv is not None else sys.argv[1:]
    provided = {a.dest for a in base._actions
                if any(opt in raw for opt in a.option_strings)}
    meta_path = args.ckpt + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        # fused/x64 are deliberately NOT adopted: they are platform
        # choices (store_true flags can't be un-set from the CLI, and a
        # CPU eval of a fused-trained checkpoint must use the scan path)
        for k in ("env", "deq", "deq_iter", "T", "hdim", "qp_iter",
                  "deq_out_type", "policy_out_type", "layer_type",
                  "solver_type", "tracking_r", "stabilization", "ws_mode",
                  "solver_carry", "rho_max", "al_reg", "terminal_lqr"):
            if k in meta and k not in provided and hasattr(args, k):
                setattr(args, k, meta[k])
        # Warm-start-carry semantics must follow the TRAINING operator, not
        # the eval-time kernel choice: pre-solver_carry checkpoints were
        # trained with the legacy per-path defaults (fused = fresh λ/ρ,
        # scan = carried), so map that to an explicit on/off for whichever
        # kernel evaluates them (round-2 verdict: cross-path evals drifted
        # 1.00→0.84 because 'auto' re-inferred carry from the EVAL path).
        if "solver_carry" not in provided and \
                meta.get("solver_carry", "auto") == "auto":
            args.solver_carry = "off" if meta.get("fused") else "on"
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    # persistent compile cache (same rationale as train.main: fused-path
    # TPU evals recompile a multi-minute Mosaic program otherwise)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.getcwd(), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    env_kwargs = ({'stabilization': True}
                  if getattr(args, 'stabilization', False) else {})
    env = make_env(args.env, **env_kwargs)
    policy = make_policy(args, env)
    # restore: template params from a fresh init
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((args.episodes, env.nx), jnp.float32)
    if args.deq:
        template = policy.init(key, x0, qp_solve=False)
    else:
        template = policy.init(key, x0)
    restored = load_checkpoint(args.ckpt, {"params": template})
    params = restored["params"]

    metrics = evaluate_policy(
        env, policy, params, episodes=args.episodes, max_steps=args.max_steps,
        noise_type=args.noise_type, noise_std=args.noise_std,
        noise_mean=args.noise_mean, seed=args.seed, deq=args.deq)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
