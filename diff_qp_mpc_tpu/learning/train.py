"""DEQ-MPC imitation-learning trainer (rebuild of deqmpc/train.py).

CLI-compatible in spirit with the reference (same flag names where they
exist: --deq --deq_iter --bsz --T --solver_type al --env integrator
--qp_solve --pretrain --lr --data_noise_type ..., deqmpc/train.py:37-71 and
run.sh). Differences by design:
- jitted train step (policy forward + AL-MPC solve + implicit backward as
  ONE XLA program) instead of eager torch;
- optimizer state included in checkpoints;
- metrics to JSON-lines (+TensorBoard when available).

Usage:
    python -m diff_qp_mpc_tpu.learning.train --env integrator --deq \
        --deq_iter 6 --bsz 256 --T 5 --qp_solve --iters 2000
"""
from __future__ import annotations

import argparse
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diff_qp_mpc_tpu.envs import make_env
from diff_qp_mpc_tpu.learning import data as data_mod
from diff_qp_mpc_tpu.learning import losses as losses_mod
from diff_qp_mpc_tpu.learning import noise as noise_mod
from diff_qp_mpc_tpu.learning.deq import NNPolicy
from diff_qp_mpc_tpu.learning.policies import DEQMPCPolicy, TrackingMPC
from diff_qp_mpc_tpu.solvers import al_mpc
from diff_qp_mpc_tpu.utils.checkpoint import save_checkpoint
from diff_qp_mpc_tpu.utils.metrics import MetricsWriter


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DEQ-MPC imitation learning")
    p.add_argument("--env", type=str, default="integrator")
    p.add_argument("--stabilization", action="store_true",
                   help="use the env's -stabilize variant (initial states "
                        "near the goal; reference env ctor flag)")
    p.add_argument("--deq", action="store_true")
    p.add_argument("--deq_iter", type=int, default=6)
    p.add_argument("--bsz", type=int, default=256)
    p.add_argument("--T", type=int, default=5)
    p.add_argument("--hdim", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr_decay", action="store_true",
                   help="cosine-decay the lr to 10%% of --lr over --iters"
                        " (long DEQ-MPC runs destabilize at fixed lr)")
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clip (0 = off, the reference"
                        " default; DEQ-MPC losses spike when the tracking"
                        " solve hits hard activations — clipping stabilizes"
                        " long runs)")
    p.add_argument("--iters", type=int, default=20000)
    p.add_argument("--solver_type", type=str, default="al")
    p.add_argument("--qp_solve", action="store_true")
    p.add_argument("--lastqp_solve", action="store_true")
    p.add_argument("--pretrain", action="store_true")
    p.add_argument("--pretrain_iters", type=int, default=1000)
    p.add_argument("--qp_iter", type=int, default=2,
                   help="AL outer iterations (reference al_iter)")
    p.add_argument("--rho_max", type=float, default=None,
                   help="cap on the AL penalty rho (default: ALConfig's "
                        "1e6). f32 TPU training of stiff robots needs a "
                        "lower cap: with solver_carry, rho saturates "
                        "across the DEQ iterations and cond(H) ~ rho/reg "
                        "exceeds f32's ~1e7 range — Newton directions "
                        "degrade to noise, the line search rejects them, "
                        "and every tracking solve past the first two DEQ "
                        "iterations returns its (infeasible) proposal "
                        "init. Measured on the quadrotor: rho_max 1e6 "
                        "stalls at dyn_res ~0.1 in f32 (scan AND fused) "
                        "where x64 reaches 1e-8; capping restores "
                        "convergence at every DEQ iteration")
    p.add_argument("--al_reg", type=float, default=None,
                   help="Levenberg damping for the AL Newton KKT solves "
                        "(default: ALConfig's 1e-7); raise together with "
                        "a lowered --rho_max to bound cond(H) for f32")
    p.add_argument("--tracking_r", type=float, default=None,
                   help="override the tracking-cost control weight R "
                        "(default: env.Rlqr). The cartpole envs ship "
                        "R=1e-8 (reference my_envs/cartpole.py:78), which "
                        "ill-conditions the 2-link tracking solve under a "
                        "learned reference; a small positive R stabilizes "
                        "training")
    # default 1 = STATE-ONLY supervision (reference train.py:65-66). With 2
    # (state+action) the unweighted L1 action term dominates for large-force
    # robots (cartpole u≈±100/±250) and the MPC phase plateaus at a loss
    # the size of the action scale.
    p.add_argument("--terminal_lqr", action="store_true",
                   help="add the infinite-horizon LQR value function "
                        "(DARE P at the env goal linearization, "
                        "solvers/lqr.py) as a dense terminal cost on the "
                        "tracking solve. Makes short-horizon MPC "
                        "stabilizing; REQUIRED for the corrected 2-link "
                        "cartpole (unstabilizable at any probed budget "
                        "without it, 64/64 at T=5 with it). ip solver "
                        "path only")
    p.add_argument("--deq_out_type", type=int, default=1)
    p.add_argument("--layer_type", type=str, default="mlp",
                   choices=["mlp", "conv"])
    p.add_argument("--fused", action="store_true",
                   help="use the fused whole-solver Pallas kernel for the "
                        "tracking MPC (TPU; elementwise-step models)")
    p.add_argument("--solver_carry", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="carry AL warm-start state (λ/ρ/history) across "
                        "successive tracking solves. 'auto' = legacy "
                        "per-path default (scan carried, fused fresh); "
                        "'on'/'off' apply to BOTH kernel paths so a "
                        "checkpoint evals identically on either")
    p.add_argument("--policy_out_type", type=int, default=1)
    p.add_argument("--data_noise_type", type=int, default=0)
    p.add_argument("--data_noise_std", type=float, default=0.0)
    p.add_argument("--data_noise_mean", type=float, default=0.0)
    p.add_argument("--action_weight", type=float, default=0.0,
                   help="weight on a scale-normalized action L1 added to"
                        " state-only supervision (out_type 1/3); e.g."
                        " 1/u_max. 0 = reference behavior")
    p.add_argument("--input_noise_std", type=float, default=0.0,
                   help="Gaussian noise std added to the policy INPUT x0 only"
                        " (supervision stays clean) — exposure-bias"
                        " regularizer: the net learns references that pull"
                        " perturbed states back onto the expert trajectory."
                        " Distinct from --data_noise_* (reference noisy-"
                        "DATA experiments, which corrupt the targets too)")
    p.add_argument("--ws_mode", type=str, default="proposal",
                   choices=["proposal", "solution"],
                   help="tracking warm-start across DEQ iterations: "
                        "'solution' = reference-exact (policies.py:647-667,"
                        " tracker refines its previous solution), "
                        "'proposal' = re-seed from each DEQ proposal "
                        "(pre-ws_mode checkpoints)")
    p.add_argument("--unwrap_angles", type=str, default="none",
                   choices=["none", "pendulum", "cartpole"],
                   help="phase-align wrapped angles in each sampled window "
                        "(needed for the reference's expert pickles; "
                        "reference train.py:141-146)")
    p.add_argument("--data", type=str, default=None,
                   help="expert pickle path (default: data/expert_traj_*)")
    p.add_argument("--expert_type", type=str, default="mpc")
    p.add_argument("--name", type=str, default=None)
    p.add_argument("--load", action="store_true",
                   help="resume params+optimizer from --ckpt "
                        "(reference --load/--ckpt, train.py:126-127)")
    p.add_argument("--ckpt", type=str, default=None,
                   help="checkpoint path (default: <logdir>/<name>/ckpt.msgpack)")
    p.add_argument("--save", action="store_true")
    p.add_argument("--logdir", type=str, default="./logs")
    p.add_argument("--ckpt_every", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (e.g. cpu); the axon sitecustomize\n                   ignores the JAX_PLATFORMS env var, so use this flag")
    p.add_argument("--x64", action="store_true")
    return p


def make_policy(args, env):
    from diff_qp_mpc_tpu.solvers.sqp_mpc import SQPConfig
    from diff_qp_mpc_tpu.solvers.trajqp import TrajQPConfig

    solver_type = getattr(args, "solver_type", "al")
    if solver_type not in ("al", "ip"):
        raise ValueError(f"--solver_type must be 'al' or 'ip', got {solver_type!r}"
                         " (reference Tracking_MPC dispatch, policies.py:605-662)")
    R = np.asarray(env.Rlqr)
    if getattr(args, "tracking_r", None) is not None:
        R = np.full_like(R, args.tracking_r)
    terminal_P = None
    if getattr(args, "terminal_lqr", False):
        from diff_qp_mpc_tpu.solvers.lqr import terminal_value_cost

        u_goal = (env.model.hover_thrust()
                  if hasattr(env.model, "hover_thrust") else None)
        P = terminal_value_cost(
            env.model, getattr(env, "goal", np.zeros(env.nx)), u_goal,
            np.asarray(env.Qlqr), R)
        # hashable static form (frozen-dataclass flax attribute)
        terminal_P = tuple(tuple(float(v) for v in row)
                           for row in np.asarray(P))
    tracking = TrackingMPC(
        model=env.model,
        T=args.T,
        Q=tuple(float(v) for v in np.asarray(env.Qlqr)),
        R=tuple(float(v) for v in R),
        u_lo=tuple(float(v) for v in env.action_space.low),
        u_hi=tuple(float(v) for v in env.action_space.high),
        cfg=al_mpc.ALConfig(al_iter=args.qp_iter, **{
            k: v for k, v in (
                ("rho_max", getattr(args, "rho_max", None)),
                ("reg", getattr(args, "al_reg", None))) if v is not None}),
        solver_type=solver_type,
        # --fused on the ip path routes the ENTIRE Mehrotra IPM through
        # the whole-solver Pallas kernel (ops/trajqp_fused_pallas);
        # otherwise the scan IPM with the Pallas Riccati KKT kernel
        sqp_cfg=SQPConfig(
            qp_iter=args.qp_iter,
            qp=(TrajQPConfig(kernel="fused")
                if (solver_type == "ip" and getattr(args, 'fused', False))
                else TrajQPConfig())),
        use_fused=getattr(args, 'fused', False),
        carry_state={"auto": None, "on": True, "off": False}[
            getattr(args, 'solver_carry', 'auto')],
        terminal_P=terminal_P,
    )
    if args.deq:
        return DEQMPCPolicy(
            nx=env.nx, nu=env.nu, nq=env.nq, T=args.T, hdim=args.hdim,
            dt=env.dt, tracking=tracking, deq_iter=args.deq_iter,
            out_type=args.deq_out_type, layer_type=args.layer_type,
            ws_mode=getattr(args, "ws_mode", "proposal"),
        )
    return NNPolicy(nx=env.nx, nu=env.nu, nq=env.nq, T=args.T,
                    hdim=args.hdim, dt=env.dt, out_type=args.policy_out_type)


def make_train_step(policy, optimizer, args):
    """One jitted imitation step; ``qp_solve`` is a static argument so
    pretrain (DEQ-only) and full DEQ-MPC compile separately
    (reference gating, train.py:146-149)."""

    @functools.partial(jax.jit, static_argnames=("qp_solve",))
    def step(params, opt_state, batch, key, qp_solve: bool):
        gt_states = noise_mod.corrupt_observation(
            key, batch["state"], args.data_noise_type,
            args.data_noise_std, args.data_noise_mean)
        gt_actions = batch["action"]
        gt_mask = batch["mask"]
        x0 = gt_states[:, 0]
        if args.input_noise_std > 0:
            key, k_in = jax.random.split(key)
            x0 = x0 + args.input_noise_std * jax.random.normal(
                k_in, x0.shape, x0.dtype)

        def loss_fn(params):
            if args.deq:
                iterates, dyn_res = policy.apply(
                    params, x0, qp_solve=qp_solve, lastqp_solve=args.lastqp_solve)
                if qp_solve:
                    loss, loss_end = losses_mod.compute_loss_deqmpc(
                        args.policy_out_type, gt_states, gt_actions, gt_mask,
                        iterates, action_weight=args.action_weight)
                else:
                    loss, loss_end = losses_mod.compute_loss_deq(
                        gt_states, gt_actions, gt_mask, iterates)
                return loss, (loss_end, dyn_res)
            states, actions = policy.apply(params, x0)
            loss, loss_end = losses_mod.compute_loss_bc(
                args.policy_out_type, gt_states, gt_actions, gt_mask,
                states if states is not None else jnp.zeros_like(gt_states),
                actions if actions is not None else jnp.zeros_like(gt_actions))
            return loss, (loss_end, jnp.zeros(()))

        (loss, (loss_end, dyn_res)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        gnorm = optax.global_norm(grads)
        # numerical-health guard: skip the update on a non-finite gradient
        # instead of letting it poison the params. Without this, one inf
        # leaf reaches clip_by_global_norm, which scales by max_norm/inf=0
        # and turns the inf entries into 0*inf = NaN inside Adam — the
        # exact failure that killed the first quadrotor fused-f32 run at
        # iter 1800 (reference-class INACC_ERR semantics: keep the best
        # iterate, never commit a diverged one, batch_LU.py:83-148).
        finite = jnp.isfinite(gnorm)
        grads = jax.tree.map(
            lambda gx: jnp.where(finite, gx, jnp.zeros_like(gx)), grads)
        new_updates, new_opt_state = optimizer.update(grads, opt_state, params)
        opt_state = jax.tree.map(
            lambda old, new: jnp.where(finite, new, old),
            opt_state, new_opt_state)
        updates = jax.tree.map(
            lambda ux: jnp.where(finite, ux, jnp.zeros_like(ux)), new_updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, loss_end, dyn_res, gnorm

    return step


def default_data_path(args, env) -> str:
    return os.path.join(
        "data", f"expert_traj_{args.expert_type}-{env.spec_id}_new.pkl")


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    # persistent compilation cache: the fused DEQ-MPC training step is a
    # multi-minute compile through the axon remote-compile tunnel; without
    # this every run (and every resume) pays it again (bench.py and
    # datagen.py already cache — train.py was the gap)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.getcwd(), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    if args.fused and jax.default_backend() == "cpu" and not args.platform:
        # the axon TPU tunnel initializes lazily and can drop mid-session;
        # when it does, jax silently falls back to CPU and the fused Pallas
        # training step runs ~100x slow. Pin with --platform axon to make
        # that a hard error instead of a 2.7 s/step surprise.
        print("WARNING: --fused requested but jax resolved to the CPU "
              "backend (TPU tunnel down?); training will be very slow. "
              "Pass --platform axon to fail fast instead.", flush=True)
    env_kwargs = ({'stabilization': True}
                  if getattr(args, 'stabilization', False) else {})
    env = make_env(args.env, **env_kwargs)
    name = args.name or (
        f"{'deqmpc' if args.deq else 'bc'}_{args.env}_T{args.T}"
        f"_bsz{args.bsz}_deq_iter{args.deq_iter}")
    logdir = os.path.join(args.logdir, name)
    writer = MetricsWriter(logdir)

    data_path = args.data or default_data_path(args, env)
    dataset = data_mod.load_expert_pickle(data_path)
    print(f"loaded {len(dataset['state'])} steps from {data_path}")

    policy = make_policy(args, env)
    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)
    init_batch = data_mod.sample_window_batch(dataset, args.bsz, args.T, rng)
    if args.deq:
        params = policy.init(key, jnp.asarray(init_batch["state"][:, 0]),
                             qp_solve=False)
    else:
        params = policy.init(key, jnp.asarray(init_batch["state"][:, 0]))
    if args.lr_decay:
        lr = optax.cosine_decay_schedule(args.lr, args.iters, alpha=0.1)
    else:
        lr = args.lr
    if args.grad_clip > 0:
        optimizer = optax.chain(optax.clip_by_global_norm(args.grad_clip),
                                optax.adam(lr))
    else:
        optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    if args.load:
        from diff_qp_mpc_tpu.utils.checkpoint import load_checkpoint

        ckpt_path = args.ckpt or os.path.join(logdir, "ckpt.msgpack")
        restored = load_checkpoint(
            ckpt_path, {"params": params, "opt_state": opt_state})
        params, opt_state = restored["params"], restored["opt_state"]
        print(f"resumed params+optimizer from {ckpt_path}")
    step = make_train_step(policy, optimizer, args)

    losses, losses_end, dyn_resids, times = [], [], [], []
    best_loss_end = float("inf")
    float_dt = jnp.float64 if args.x64 else jnp.float32
    for i in range(args.iters):
        batch = data_mod.sample_window_batch(dataset, args.bsz, args.T, rng)
        if args.unwrap_angles != "none":
            batch["state"] = data_mod.unwrap_window_angles(
                batch["state"], args.unwrap_angles)
        batch = {k: jnp.asarray(v).astype(float_dt)
                 if np.issubdtype(np.asarray(v).dtype, np.floating)
                 else jnp.asarray(v) for k, v in batch.items()}
        key, sub = jax.random.split(key)
        qp_solve = args.qp_solve and not (args.pretrain and i < args.pretrain_iters)
        t0 = time.time()
        params, opt_state, loss, loss_end, dyn_res, gnorm = step(
            params, opt_state, batch, sub, qp_solve)
        loss.block_until_ready()
        times.append(time.time() - t0)
        losses.append(float(loss))
        losses_end.append(float(loss_end))
        dyn_resids.append(float(dyn_res))

        if i % args.ckpt_every == 0:
            mode = "deqmpc" if qp_solve else ("deq" if args.deq else "bc")
            print(f"iter {i} [{mode}] loss {np.mean(losses)/max(args.deq_iter,1):.4f} "
                  f"loss_end {np.mean(losses_end):.4f} dyn_res {np.mean(dyn_resids):.4f} "
                  f"step_time {np.mean(times)*1e3:.1f}ms grad_norm {float(gnorm):.2f}")
            writer.scalar("losses/loss_avg",
                          np.mean(losses) / max(args.deq_iter, 1), i)
            writer.scalar("losses/loss_end", np.mean(losses_end), i)
            writer.scalar("stats/dyn_res", np.mean(dyn_resids), i)
            writer.scalar("stats/step_time_ms", np.mean(times) * 1e3, i)
            if args.save:
                save_checkpoint(os.path.join(logdir, "ckpt.msgpack"),
                                params, opt_state, meta=vars(args))
                # long DEQ-MPC runs can destabilize late (large implicit-
                # gradient spikes); keep the best-window params so eval is
                # never hostage to the last iterate
                # skip the pretrain->deqmpc boundary window: its loss
                # average still mixes (much smaller) pretrain-mode losses
                first_full = (args.pretrain_iters if args.pretrain else 0) \
                    + args.ckpt_every
                if qp_solve and i >= first_full and \
                        np.mean(losses_end) < best_loss_end:
                    best_loss_end = float(np.mean(losses_end))
                    save_checkpoint(os.path.join(logdir, "ckpt_best.msgpack"),
                                    params, opt_state, meta=vars(args))
            losses, losses_end, dyn_resids, times = [], [], [], []
    writer.close()
    return params


if __name__ == "__main__":
    main()
