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
import json
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


def render_quadrotor_frame(ax, x, trace=None, arm=0.3):
    """12-state RexQuadrotor (pos, MRP attitude, vel, ω): 3D pose plot —
    rotor cross oriented by the MRP rotation, trajectory trace, goal at
    the origin (reference animators live in deqmpc/utils.py; the quadrotor
    had none, so this is a capability add)."""
    from diff_qp_mpc_tpu.models.rotation import mrp_to_rot

    pos = np.asarray(x[:3], np.float64)
    R = np.asarray(mrp_to_rot(jnp.asarray(x[3:6])), np.float64)
    ax.clear()
    lim = 1.5
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_zlim(-lim, lim)
    ax.scatter([0], [0], [0], marker="*", s=80, color="tab:green")
    if trace is not None and len(trace):
        tr = np.asarray(trace)
        ax.plot(tr[:, 0], tr[:, 1], tr[:, 2], lw=0.8, color="tab:gray",
                alpha=0.7)
    # rotor arms along body x/y axes
    for axis, color in ((R[:, 0], "tab:blue"), (R[:, 1], "tab:orange")):
        p0, p1 = pos - arm * axis, pos + arm * axis
        ax.plot([p0[0], p1[0]], [p0[1], p1[1]], [p0[2], p1[2]],
                "o-", lw=2, color=color, markersize=3)
    ax.set_title(f"|pos|={np.linalg.norm(pos):.3f}")


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


def save_gif(frames_x, render_fn, out_path, fps=20, subplot_kw=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    fig, ax = plt.subplots(figsize=(4, 4), subplot_kw=subplot_kw or {})

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
    p.add_argument("--x64", action="store_true",
                   help="enable f64 (the quadrotor tracking solve needs it "
                        "off-TPU)")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    from diff_qp_mpc_tpu.envs import make_env

    # a checkpoint carries its full training config next to it
    # (utils/checkpoint.py writes <ckpt>.meta.json); prefer it so the
    # rebuilt policy always matches the stored params
    meta = {}
    if args.ckpt and os.path.exists(args.ckpt + ".meta.json"):
        with open(args.ckpt + ".meta.json") as f:
            meta = json.load(f)

    env_name = meta.get("env", args.env)
    env_kwargs = {"stabilization": True} if meta.get("stabilization") else {}
    env = make_env(env_name, **env_kwargs)
    if args.ckpt:
        import types

        from diff_qp_mpc_tpu.learning.train import make_policy
        from diff_qp_mpc_tpu.utils.checkpoint import load_checkpoint

        targs = types.SimpleNamespace(
            T=meta.get("T", args.T), deq=meta.get("deq", True),
            deq_iter=meta.get("deq_iter", args.deq_iter),
            hdim=meta.get("hdim", args.hdim),
            qp_iter=meta.get("qp_iter", 2),
            deq_out_type=meta.get("deq_out_type", 2),
            layer_type=meta.get("layer_type", "mlp"),
            solver_type=meta.get("solver_type", "al"),
            tracking_r=meta.get("tracking_r"),
            rho_max=meta.get("rho_max"), al_reg=meta.get("al_reg"),
            ws_mode=meta.get("ws_mode", "proposal"),
            solver_carry=meta.get("solver_carry", "auto"),
            terminal_lqr=meta.get("terminal_lqr", False),
            fused=False,  # scan path: visualization runs on CPU
            policy_out_type=meta.get("policy_out_type", 2))
        policy = make_policy(targs, env)
        template = policy.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, env.nx), jnp.float32),
                               qp_solve=False)
        params = load_checkpoint(args.ckpt, {"params": template})["params"]
        xs = rollout_policy(env, policy, params, steps=args.steps,
                            seed=args.seed)
    else:
        xs = rollout_mpc(env, steps=args.steps, seed=args.seed)
    subplot_kw = None
    if env_name == "pendulum":
        render = render_pendulum_frame
    elif env_name.startswith("cartpole"):
        lengths = (0.5,) if "1" in env_name else (1.0, 1.0)
        render = lambda ax, x: render_cartpole_frame(ax, x, lengths)
    elif env_name.startswith(("quadrotor", "rexquad")):
        trace = xs[:, 0]
        render = lambda ax, x: render_quadrotor_frame(ax, x, trace=trace)
        subplot_kw = {"projection": "3d"}
    else:
        raise NotImplementedError(env_name)
    save_gif(xs[:, 0], render, args.out, subplot_kw=subplot_kw)
    print(f"wrote {args.out} ({len(xs)} frames); final state {xs[-1, 0]}")


if __name__ == "__main__":
    main()
