"""Sharded solver / training-step builders.

Builds jitted computations with explicit in/out shardings over the data
mesh: batch-sharded solver inputs, replicated parameters, automatic
gradient all-reduce (jit lowers the mean over the sharded batch axis to a
psum over ICI). This is the whole distributed story for batch-parallel
QP-MPC — no hand-written collectives needed (SURVEY.md §2.6).
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from diff_qp_mpc_tpu.core.types import ALState, Bounds, DiagQuadCost
from diff_qp_mpc_tpu.learning import losses as losses_mod
from diff_qp_mpc_tpu.parallel import mesh as mesh_mod
from diff_qp_mpc_tpu.solvers import al_mpc


def sharded_al_solve(model, cfg: al_mpc.ALConfig, mesh):
    """Batch-sharded AL-MPC solve: (cost, x0, bounds, state) -> (x, u,
    state', stats), all batch-major arrays sharded over the data axis."""
    sh_b = mesh_mod.batch_sharding(mesh)

    @functools.partial(jax.jit, out_shardings=None)
    def solve(cost, x0, bounds, state):
        return al_mpc.solve(model, cost, x0, bounds, state, cfg)

    def run(cost, x0, bounds, state):
        cost = mesh_mod.shard_batch(cost, mesh)
        x0 = jax.device_put(x0, sh_b)
        state = mesh_mod.shard_batch(state, mesh)
        return solve(cost, x0, bounds, state)

    return run


def sharded_train_step(policy, optimizer, mesh, out_type: int = 2):
    """Data-parallel DEQ-MPC imitation step: params replicated, batch
    sharded, gradients all-reduced by jit's partitioner."""
    repl = mesh_mod.replicated(mesh)

    @jax.jit
    def step(params, opt_state, batch):
        gt_states = batch["state"]
        gt_actions = batch["action"]
        gt_mask = batch["mask"]
        x0 = gt_states[:, 0]

        def loss_fn(p):
            iterates, dyn_res = policy.apply(p, x0, qp_solve=True)
            loss, loss_end = losses_mod.compute_loss_deqmpc(
                out_type, gt_states, gt_actions, gt_mask, iterates)
            return loss, (loss_end, dyn_res)

        (loss, (loss_end, dyn_res)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, loss_end, dyn_res

    def run(params, opt_state, batch):
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        batch = mesh_mod.shard_batch(batch, mesh)
        return step(params, opt_state, batch)

    return run
