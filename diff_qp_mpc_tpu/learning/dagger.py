"""DAgger-style expert relabeling of policy-visited states.

Beyond-reference capability (the reference trains pure behavior cloning;
its cartpole policies never demonstrably hold upright closed-loop — its
cgac cp1 dataset's median final |θ−π| is 3.1 rad). Imitation of expert
windows leaves an exposure gap: closed-loop, the policy visits states the
expert data never covers (e.g. arriving at the unstable equilibrium with
residual velocity) and has no supervision there. The classic fix (Ross et
al., AISTATS 2011): roll the TRAINED policy, collect the states it
actually visits, have the expert relabel them, and fine-tune on the
aggregate.

Here the expert is the framework's own receding-horizon SQP-MPC planner
(learning/datagen.mpc_expert_rollouts with ``init_states``), so the whole
loop is self-contained:

    python -m diff_qp_mpc_tpu.learning.dagger --env cartpole1link \
        --deq --deq_iter 6 --qp_solve --T 5 --qp_iter 2 \
        --ckpt logs/<run>/ckpt_best.msgpack --episodes 64 \
        --num_relabel 200 --out data/dagger-Cartpole1l-v0.pkl

then fine-tune with train.py --data <orig>,<dagger-out> --load.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from diff_qp_mpc_tpu.envs import make_env
from diff_qp_mpc_tpu.learning.data import save_expert_pickle
from diff_qp_mpc_tpu.learning.train import build_parser, make_policy
from diff_qp_mpc_tpu.utils.checkpoint import load_checkpoint


def collect_policy_states(env, policy, params, episodes: int = 64,
                          max_steps: int = 200, seed: int = 0,
                          deq: bool = True) -> np.ndarray:
    """Closed-loop rollout of the trained policy; returns every visited
    state of every episode while it is alive, [N, nx]."""
    key = jax.random.PRNGKey(seed)
    k_reset, key = jax.random.split(key)
    state = env.reset(k_reset, episodes)

    @jax.jit
    def act(params, obs):
        if deq:
            iterates, _ = policy.apply(params, obs, qp_solve=True)
            return iterates[-1].actions[:, 0]
        states, actions = policy.apply(params, obs)
        return actions[:, 0]

    visited = []
    alive = np.ones(episodes, bool)
    for _ in range(max_steps):
        u = act(params, state.x)
        state, _, done = env.step(state, u)
        x = np.asarray(state.x)
        visited.append(x[alive])
        alive &= ~np.asarray(done)
        if not alive.any():
            break
    return np.concatenate(visited, axis=0)


def select_relabel_states(states: np.ndarray, num: int,
                          rng: np.random.RandomState) -> np.ndarray:
    """Uniform subsample of the visited set (the policy's own state
    distribution IS the DAgger distribution — no hand-crafted filter)."""
    if len(states) <= num:
        return states
    idx = rng.choice(len(states), size=num, replace=False)
    return states[idx]


def main(argv=None):
    p = build_parser()
    p.add_argument("--episodes", type=int, default=64)
    p.add_argument("--max_steps", type=int, default=200)
    p.add_argument("--num_relabel", type=int, default=200,
                   help="how many visited states the MPC expert relabels")
    p.add_argument("--relabel_steps", type=int, default=120,
                   help="length of each expert rollout from a visited state")
    p.add_argument("--filter_goal_dist", type=float, default=0.0,
                   help="keep only visited states within this distance of"
                        " the goal (env._delta_upright / position norm)"
                        " before subsampling — targets relabeling at the"
                        " capture region where closed-loop drift happens")
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args(argv)
    if args.ckpt is None:
        p.error("--ckpt (trained policy checkpoint) is required")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    env_kwargs = ({"stabilization": True}
                  if getattr(args, "stabilization", False) else {})
    env = make_env(args.env, **env_kwargs)
    policy = make_policy(args, env)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((args.episodes, env.nx), jnp.float32)
    if args.deq:
        template = policy.init(key, x0, qp_solve=False)
    else:
        template = policy.init(key, x0)
    params = load_checkpoint(args.ckpt, {"params": template})["params"]

    states = collect_policy_states(
        env, policy, params, episodes=args.episodes,
        max_steps=args.max_steps, seed=args.seed, deq=args.deq)
    print(f"collected {len(states)} policy-visited states")
    if args.filter_goal_dist > 0:
        xs = jnp.asarray(states)
        if hasattr(env, "_delta_upright"):
            dist = np.asarray(env._delta_upright(xs))
        else:
            goal = np.asarray(getattr(env, "goal", np.zeros(env.nx)))
            dist = np.linalg.norm(states - goal, axis=-1)
        states = states[dist < args.filter_goal_dist]
        print(f"{len(states)} within {args.filter_goal_dist} of the goal")
    rng = np.random.RandomState(args.seed)
    picked = select_relabel_states(states, args.num_relabel, rng)
    print(f"relabeling {len(picked)} states with the SQP-MPC expert")

    # the expert relabels with the env's *stabilize* planner settings when
    # available (the corrective data is what closed-loop capture needs)
    from diff_qp_mpc_tpu.learning.datagen import mpc_expert_rollouts

    stab_env = make_env(args.env, stabilization=True) \
        if not env_kwargs.get("stabilization") else env
    trajs = mpc_expert_rollouts(
        stab_env, num_traj=len(picked), max_steps=args.relabel_steps,
        seed=args.seed, init_states=picked)
    stab_env_sid = stab_env.spec_id
    save_expert_pickle(args.out, trajs)
    lens = [len(t) for t in trajs]
    print(json.dumps({
        "out": args.out, "num_traj": len(trajs),
        "steps": int(np.sum(lens)), "mean_len": float(np.mean(lens)),
        "expert_env": stab_env_sid,
    }))


if __name__ == "__main__":
    main()
