"""Closed-loop policy visualization (rebuild of deqmpc/visualize*.py +
deqmpc/utils.py animators).

Rolls a trained DEQ-MPC policy (or a plain MPC controller) closed-loop in
an environment and renders pendulum/cartpole animations (GIF via pillow —
no ffmpeg dependency).

Usage:
    python -m diff_qp_mpc_tpu.learning.visualize --env pendulum \
        --ckpt logs/<name>/ckpt.msgpack --steps 100 --out rollout.gif
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def render_pendulum_frame(ax, x, l=1.0):
    """θ measured from upright (deqmpc convention)."""
    th = float(x[0])
    ax.clear()
    ax.set_xlim(-1.5 * l, 1.5 * l)
    ax.set_ylim(-1.5 * l, 1.5 * l)
    ax.set_aspect("equal")
    ax.plot([0, l * np.sin(th)], [0, l * np.cos(th)], "o-", lw=3)
    ax.set_title(f"theta={th:+.2f}")


def render_cartpole_frame(ax, x, lengths=(0.5,)):
    """State (cart, θ₁.., ẋ, θ̇..); θ from DOWN (upright = π)."""
    nq = len(lengths) + 1
    cart = float(x[0])
    ax.clear()
    span = 2.0 + sum(lengths)
    ax.set_xlim(cart - span, cart + span)
    ax.set_ylim(-span, span)
    ax.set_aspect("equal")
    ax.plot([cart - 0.2, cart + 0.2], [0, 0], lw=6)
    px, py, th_abs = cart, 0.0, 0.0
    for i, l in enumerate(lengths):
        th_abs += float(x[1 + i])
        nx_, ny_ = px + l * np.sin(th_abs), py - l * np.cos(th_abs)
        ax.plot([px, nx_], [py, ny_], "o-", lw=3)
        px, py = nx_, ny_


def rollout_mpc(env, steps=100, bsz=1, seed=0, al_iter=4):
    """Closed-loop AL-MPC rollout (no learned policy) — the
    qpth/env_dx/control.py receding-horizon demo equivalent."""
    import diff_qp_mpc_tpu as dq
    from diff_qp_mpc_tpu.solvers import al_mpc

    model = env.model
    T = 10
    n = model.nx + model.nu
    Cd = jnp.broadcast_to(
        jnp.concatenate([jnp.asarray(env.Qlqr), jnp.asarray(env.Rlqr)]),
        (bsz, T, n))
    goal = getattr(env, "goal", jnp.zeros((model.nx,)))
    xu_goal = jnp.concatenate([jnp.asarray(goal), jnp.zeros((model.nu,))])
    cost = dq.DiagQuadCost(Cd=Cd, c=jnp.broadcast_to(-Cd * xu_goal, Cd.shape))
    bounds = dq.Bounds(u_lo=jnp.asarray(env.action_space.low, jnp.float32),
                       u_hi=jnp.asarray(env.action_space.high, jnp.float32))
    cfg = al_mpc.ALConfig(al_iter=al_iter, rho_max=1e5)
    state = dq.ALState.init(bsz, T, model.nx, model.nu)

    @jax.jit
    def mpc_step(x0, st):
        xs, us, st, _ = al_mpc.solve(model, cost, x0, bounds, st, cfg)
        return us[:, 0], al_mpc.shift(st)

    es = env.reset(jax.random.PRNGKey(seed), bsz)
    xs_hist = [np.asarray(es.x)]
    for _ in range(steps):
        u0, state = mpc_step(es.x, state)
        es, _, _ = env.step(es, u0)
        xs_hist.append(np.asarray(es.x))
    return np.stack(xs_hist)


def save_gif(frames_x, render_fn, out_path, fps=20):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    fig, ax = plt.subplots(figsize=(4, 4))

    def update(i):
        render_fn(ax, frames_x[i])
        return []

    anim = FuncAnimation(fig, update, frames=len(frames_x))
    anim.save(out_path, writer=PillowWriter(fps=fps))
    plt.close(fig)


def rollout_policy(env, policy, params, steps=100, bsz=1, seed=0):
    """Closed-loop rollout of a trained DEQ-MPC policy (the reference's
    visualize_*_new.py flow: load ckpt, act with the first planned
    action)."""
    state = env.reset(jax.random.PRNGKey(seed), bsz)

    @jax.jit
    def act(params, obs):
        iterates, _ = policy.apply(params, obs, qp_solve=True)
        return iterates[-1].actions[:, 0]

    xs = [np.asarray(state.x)]
    for _ in range(steps):
        u = act(params, state.x)
        state, _, _ = env.step(state, u)
        xs.append(np.asarray(state.x))
    return np.stack(xs)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", type=str, default="pendulum")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--out", type=str, default="rollout.gif")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None,
                   help="trained DEQ-MPC checkpoint: roll out the policy "
                        "instead of the raw MPC")
    p.add_argument("--T", type=int, default=5)
    p.add_argument("--deq_iter", type=int, default=6)
    p.add_argument("--hdim", type=int, default=128)
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from diff_qp_mpc_tpu.envs import make_env

    env = make_env(args.env)
    if args.ckpt:
        import types

        from diff_qp_mpc_tpu.learning.train import make_policy
        from diff_qp_mpc_tpu.utils.checkpoint import load_checkpoint

        targs = types.SimpleNamespace(
            T=args.T, deq=True, deq_iter=args.deq_iter, hdim=args.hdim,
            qp_iter=2, deq_out_type=2, layer_type="mlp", solver_type="al",
            fused=False, policy_out_type=2)
        policy = make_policy(targs, env)
        template = policy.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, env.nx), jnp.float32),
                               qp_solve=False)
        params = load_checkpoint(args.ckpt, {"params": template})["params"]
        xs = rollout_policy(env, policy, params, steps=args.steps,
                            seed=args.seed)
    else:
        xs = rollout_mpc(env, steps=args.steps, seed=args.seed)
    if args.env == "pendulum":
        render = render_pendulum_frame
    elif args.env.startswith("cartpole"):
        lengths = (0.5,) if "1" in args.env else (1.0, 1.0)
        render = lambda ax, x: render_cartpole_frame(ax, x, lengths)
    else:
        raise NotImplementedError(args.env)
    save_gif(xs[:, 0], render, args.out)
    print(f"wrote {args.out} ({len(xs)} frames); final state {xs[-1, 0]}")


if __name__ == "__main__":
    main()
