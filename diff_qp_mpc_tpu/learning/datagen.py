"""Expert-trajectory generation (rebuild of deqmpc/datagen.py).

MPC experts for every env (the reference additionally rolls out pre-trained
SAC/PPO/CGAC checkpoints, datagen.py:145-276 — those checkpoints are
loadable through learning.data if present; the solver experts here
regenerate equivalent datasets from scratch). Output is the reference
pickle format: a list of trajectories, each a list of (state, action)
numpy pairs (datagen.py:278-308), written to
``data/expert_traj_mpc-<spec_id>_new.pkl``.

Usage: python -m diff_qp_mpc_tpu.learning.datagen --env integrator \
           --num_traj 200 --T 30
"""
from __future__ import annotations

import argparse
import os

import jax

# expert-planner programs are large (SQP scan × IPM scan × Riccati scan);
# persist their compilations — the axon remote-compile tunnel is minutes
# per program
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.getcwd(), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from diff_qp_mpc_tpu.core.types import Bounds, DiagQuadCost
from diff_qp_mpc_tpu.envs import make_env
from diff_qp_mpc_tpu.learning.data import save_expert_pickle
from diff_qp_mpc_tpu.solvers import sqp_mpc
from diff_qp_mpc_tpu.solvers.sqp_mpc import SQPConfig


# Per-env expert planner settings (the role of the reference's hand-tuned
# per-robot expert configs: datagen.py:24-56 PendulumExpert, datagen_cp1.py
# :30-45 CartpoleExpert goal_weights [1,10,1,1] / ctrl_penalty 1e-4 / T=100).
# Weights are in THIS repo's state conventions (cartpole upright θ = π).
EXPERT_PLANNER = {
    "Cartpole1l-v0": dict(T=80, Q=(1.0, 10.0, 1.0, 1.0), R=(1e-4,),
                          qp_iter=6, max_ls=5),
    "Cartpole1l-v0-stabilize": dict(T=60, Q=(1.0, 10.0, 1.0, 1.0), R=(1e-4,),
                                    qp_iter=10),
    "Cartpole2l-v0": dict(T=120, Q=(1.0, 10.0, 10.0, 1.0, 1.0, 1.0),
                          R=(1e-4,), qp_iter=12),
    # terminal_lqr: DARE value-function terminal cost (solvers/lqr.py).
    # The plain T=60 expert technically captures from the stabilize box
    # (final err 0.04) but takes multi-radian EXCURSIONS doing it (cart
    # p90 |dev| 4.2, velocities > 2) — data an imitation policy then
    # reproduces closed-loop, wobbling itself off the basin. The
    # terminal-P expert locks in directly (median err 0.002, no
    # excursions) at a sixth of the horizon.
    "Cartpole2l-v0-stabilize": dict(T=10, Q=(1.0,) * 6, R=(0.01,),
                                    qp_iter=4, terminal_lqr=True),
    "Pendulum-v0": dict(T=40, Q=(10.0, 1.0), R=(1e-3,), qp_iter=10),
    "Pendulum-v0-stabilize": dict(T=20, Q=(10.0, 1.0), R=(1e-3,), qp_iter=5),
    # u_goal="hover": center the control penalty at the hover thrust, not 0 —
    # with R|u|^2 around u=0 the planner trades altitude for thrust and the
    # whole dataset hovers with a steady-state z sag of ~0.06 (> the 0.05
    # success radius), capping any imitation policy below success.
    "RexQuadrotor-v0": dict(T=20, Q=(10.0,) * 3 + (1.0,) * 9, R=(0.1,) * 4,
                            qp_iter=5, u_goal="hover"),
}

# Per-dim half-widths of the capture-corridor initial-state box around
# env.goal (--capture): poles near upright at the approach velocities a
# swing-up actually arrives with. The stabilize envs' reset boxes scale
# all dims uniformly (init_scale), which cannot express "small angle,
# large angular rate" — but that corner is exactly where closed-loop
# swing-up policies fail (they pass through upright at speed and never
# lock in; RESULTS.md cartpole-1L diagnostics).
CAPTURE_BOX = {
    "Pendulum": (0.5, 2.0),
    "Cartpole1l": (1.0, 0.4, 2.0, 3.0),
    "Cartpole2l": (0.8, 0.3, 0.3, 1.5, 2.0, 2.0),
}


def mpc_expert_rollouts(env, num_traj: int, T: int = 30, max_steps: int = 200,
                        seed: int = 0, qp_iter: int = 5,
                        success_filter: bool = False,
                        init_states=None):
    """Batched receding-horizon SQP-MPC expert (the role of
    datagen.py:24-143 PendulumExpert/get_*_expert_traj_mpc, using the
    shooting solver for long-horizon robustness).

    Per-env planner settings come from EXPERT_PLANNER when available
    (overriding T/qp_iter and the env LQR weights). With
    ``success_filter``, 2× the requested batch is rolled out and only
    trajectories whose final state passes env._success are kept (topped up
    with the closest failures if needed) — local SQP swing-up does not
    succeed from every initial state, which is exactly why the reference's
    committed cartpole swing-up data comes from an RL policy while its MPC
    cartpole dataset is stabilize-only."""
    model = env.model
    nx, nu = env.nx, env.nu
    planner = EXPERT_PLANNER.get(env.spec_id, {})
    T = planner.get("T", T)
    qp_iter = planner.get("qp_iter", qp_iter)
    if init_states is not None:  # DAgger relabeling / capture-corridor
        # sampling: expert from externally chosen states. With
        # success_filter the caller passes 2x the states it wants kept.
        bsz = len(init_states)
        num_traj = bsz // 2 if success_filter else bsz
    else:
        bsz = 2 * num_traj if success_filter else num_traj
    n = nx + nu
    Q = jnp.asarray(planner.get("Q", env.Qlqr), jnp.float64)
    R = jnp.asarray(planner.get("R", env.Rlqr), jnp.float64)
    Cd = jnp.broadcast_to(jnp.concatenate([Q, R]), (bsz, T, n))
    goal = getattr(env, "goal", jnp.zeros((nx,)))
    if planner.get("u_goal") == "hover":
        u_goal = jnp.asarray(model.hover_thrust(), jnp.float64)
    else:
        u_goal = jnp.zeros((nu,))
    xu_goal = jnp.concatenate([jnp.asarray(goal, jnp.float64), u_goal])
    if planner.get("terminal_lqr"):
        from diff_qp_mpc_tpu.core.types import QuadCost
        from diff_qp_mpc_tpu.solvers.lqr import terminal_value_cost

        P = terminal_value_cost(model, goal, u_goal if
                                planner.get("u_goal") else None, Q, R)
        Cfull = jax.vmap(jax.vmap(jnp.diag))(Cd)
        Cfull = Cfull.at[:, -1, :nx, :nx].add(P.astype(Cfull.dtype))
        cost = QuadCost(C=Cfull,
                        c=-jnp.einsum("btij,j->bti", Cfull, xu_goal))
    else:
        cost = DiagQuadCost(
            Cd=Cd, c=jnp.broadcast_to(-Cd * xu_goal, (bsz, T, n)))
    bounds = Bounds(
        u_lo=jnp.asarray(env.action_space.low, jnp.float64),
        u_hi=jnp.asarray(env.action_space.high, jnp.float64),
    )
    cfg = SQPConfig(qp_iter=qp_iter, max_ls=planner.get("max_ls", 10))

    @jax.jit
    def plan(x0, u_ws):
        res = sqp_mpc.solve(model, cost, x0, bounds, u_ws,
                            cfg=cfg, differentiable=False)
        return res.x, res.u

    key = jax.random.PRNGKey(seed)
    state = env.reset(key, bsz)
    if init_states is not None:
        import dataclasses

        state = dataclasses.replace(
            state, x=jnp.asarray(init_states, state.x.dtype))
    u_ws = jnp.zeros((bsz, T, nu), jnp.float64)

    xs, us, dones = [], [], []
    done_seen = jnp.zeros((bsz,), bool)
    for _ in range(max_steps):
        x = state.x.astype(jnp.float64)
        _, u_plan = plan(x, u_ws)
        u0 = u_plan[:, 0]
        xs.append(np.asarray(x, np.float32))
        us.append(np.asarray(u0, np.float32))
        state, _, done = env.step(state, u0.astype(state.x.dtype))
        done_seen = done_seen | done
        dones.append(np.asarray(done_seen))
        u_ws = jnp.concatenate([u_plan[:, 1:], u_plan[:, -1:]], axis=1)
        if bool(done_seen.all()):
            break

    # split batch into per-trajectory (state, action) lists, truncated at done
    trajs, succ = [], []
    steps = len(xs)
    for b in range(bsz):
        end = steps
        for t in range(steps):
            if dones[t][b]:
                end = t + 1
                break
        trajs.append([(xs[t][b], us[t][b]) for t in range(end)])
        succ.append(bool(env._success(jnp.asarray(xs[end - 1][b]))))
    if success_filter:
        good = [t for t, s in zip(trajs, succ) if s]
        print(f"success filter: {len(good)}/{bsz} trajectories reached goal")
        if len(good) < num_traj:
            rest = [t for t, s in zip(trajs, succ) if not s]
            good = good + rest[: num_traj - len(good)]
        return good[:num_traj]
    return trajs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="integrator")
    p.add_argument("--num_traj", type=int, default=100)
    p.add_argument("--T", type=int, default=30)
    p.add_argument("--max_steps", type=int, default=200)
    p.add_argument("--qp_iter", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (e.g. cpu); the axon sitecustomize\n                   ignores the JAX_PLATFORMS env var, so use this flag")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--stabilization", action="store_true")
    p.add_argument("--init_scale", type=float, default=None,
                   help="widen the env's initial-state box (stabilize-data"
                        " basin coverage)")
    p.add_argument("--no_success_term", action="store_true",
                   help="run episodes to the step limit even after the"
                        " success streak (collect goal-HOLDING tails)")
    p.add_argument("--expert", type=str, default="mpc",
                   choices=["mpc", "ppo", "sac"],
                   help="mpc: receding-horizon SQP expert; ppo/sac: train an"
                        " RL expert first (learning.rl), then roll it out")
    p.add_argument("--ppo_iters", type=int, default=500)
    p.add_argument("--sac_iters", type=int, default=40000)
    p.add_argument("--success_filter", action="store_true",
                   help="roll 2x the batch and keep goal-reaching trajs")
    p.add_argument("--capture", action="store_true",
                   help="sample initial states from a per-dim CAPTURE"
                        " corridor around the goal (poles near upright at"
                        " real approach velocities) instead of the env's"
                        " reset box, and run the stabilize MPC expert —"
                        " teaches the lock-in that swing-up data lacks"
                        " (closed-loop failures limit-cycle through upright"
                        " without holding; see RESULTS.md cartpole-1L)")
    p.add_argument("--capture_box", type=str, default=None,
                   help="comma-separated per-dim half-widths of the capture"
                        " box around env.goal (default: per-env table)")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu":
            # expert solves run in f64 on CPU (reference experts are f64,
            # datagen_cp1.py:46-63); TPU datagen runs f32 by design
            jax.config.update("jax_enable_x64", True)

    kwargs = {}
    if args.stabilization:
        kwargs["stabilization"] = True
    if args.init_scale is not None:
        kwargs["init_scale"] = args.init_scale
    env = make_env(args.env, **kwargs)
    if args.no_success_term:
        env.terminate_on_success = False
    if args.expert == "ppo":
        from diff_qp_mpc_tpu.learning.rl import ppo_expert_rollouts, train_ppo

        params, net = train_ppo(env, iters=args.ppo_iters, seed=args.seed)
        trajs = ppo_expert_rollouts(env, params, net, args.num_traj,
                                    args.max_steps, args.seed)
    elif args.expert == "sac":
        from diff_qp_mpc_tpu.learning.rl import (SACConfig,
                                                 sac_expert_rollouts,
                                                 train_sac)

        _, act = train_sac(env, SACConfig(), iters=args.sac_iters,
                           seed=args.seed)
        trajs = sac_expert_rollouts(env, act, args.num_traj,
                                    args.max_steps, args.seed)
    elif args.capture:
        if args.capture_box is not None:
            box = np.array([float(v) for v in args.capture_box.split(",")])
        else:
            box = np.asarray(CAPTURE_BOX[env.spec_id.split("-v0")[0]])
        goal = np.asarray(env.goal)
        n_init = 2 * args.num_traj if args.success_filter else args.num_traj
        rng = np.random.RandomState(args.seed)
        init = goal + rng.uniform(-box, box, size=(n_init, env.nx))
        trajs = mpc_expert_rollouts(env, args.num_traj, args.T,
                                    args.max_steps, args.seed, args.qp_iter,
                                    success_filter=args.success_filter,
                                    init_states=init)
    else:
        trajs = mpc_expert_rollouts(env, args.num_traj, args.T,
                                    args.max_steps, args.seed, args.qp_iter,
                                    success_filter=args.success_filter)
    suffix = "-capture" if args.capture else ""
    out = args.out or os.path.join(
        "data", f"expert_traj_{args.expert}-{env.spec_id}{suffix}_new.pkl")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    save_expert_pickle(out, trajs)
    lens = [len(t) for t in trajs]
    print(f"wrote {len(trajs)} trajectories "
          f"(len min/mean/max {min(lens)}/{np.mean(lens):.1f}/{max(lens)}) to {out}")


if __name__ == "__main__":
    main()
