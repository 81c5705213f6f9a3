"""Imitation losses (deqmpc/policies.py:787-847).

Masked L1 supervision of every DEQ-MPC iterate; loss_end reports the final
iterate alone (train.py logs both as losses/loss_avg and losses/loss_end).
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from diff_qp_mpc_tpu.learning.policies import DEQMPCRollout

Array = jnp.ndarray


def _masked_l1(pred: Array, gt: Array, mask: Array) -> Array:
    """Σ_features |err| masked per step, mean over (batch, T)
    (policies.py:819-833 add_loss_based_on_out_type)."""
    return jnp.abs((pred - gt) * mask[:, :, None]).sum(axis=-1).mean()


def iterate_loss(out_type: int, gt_states: Array, gt_actions: Array,
                 mask: Array, states: Array, actions: Array,
                 action_weight: float = 0.0) -> Array:
    loss = 0.0
    if out_type in (0, 2):
        loss += _masked_l1(actions, gt_actions, mask)
    if out_type in (1, 2):
        loss += _masked_l1(states, gt_states, mask)
    if out_type == 3:
        nq = gt_states.shape[-1] // 2
        loss += _masked_l1(states[..., :nq], gt_states[..., :nq], mask)
    if action_weight > 0.0 and out_type in (1, 3):
        # scale-normalized action term: the reference's out_type-2 adds the
        # RAW action L1, which for large-force robots (cartpole u≈±100/250)
        # dominates the state term and stalls training; a small weight
        # (e.g. 1/u_max) keeps the direct feedback supervision without the
        # scale problem
        loss += action_weight * _masked_l1(actions, gt_actions, mask)
    return loss


def compute_loss_deqmpc(out_type: int, gt_states, gt_actions, mask,
                        iterates: List[DEQMPCRollout],
                        action_weight: float = 0.0) -> Tuple[Array, Array]:
    """Supervise the MPC-projected trajectory of EVERY iterate
    (policies.py:800-808)."""
    loss = 0.0
    for it in iterates:
        loss = loss + iterate_loss(out_type, gt_states, gt_actions, mask,
                                   it.states, it.actions, action_weight)
    last = iterates[-1]
    loss_end = iterate_loss(out_type, gt_states, gt_actions, mask,
                            last.states, last.actions, action_weight)
    return loss, loss_end


def compute_loss_deq(gt_states, gt_actions, mask,
                     iterates: List[DEQMPCRollout]) -> Tuple[Array, Array]:
    """Pretraining: supervise the raw network proposals, state-only
    (policies.py:787-797 — out_type hardcoded to 1)."""
    loss = 0.0
    for it in iterates:
        loss = loss + iterate_loss(1, gt_states, gt_actions, mask,
                                   it.net_states, it.actions)
    last = iterates[-1]
    loss_end = iterate_loss(1, gt_states, gt_actions, mask,
                            last.net_states, last.actions)
    return loss, loss_end


def compute_loss_bc(out_type: int, gt_states, gt_actions, mask,
                    states, actions) -> Tuple[Array, Array]:
    """Vanilla behavior cloning (policies.py:811-816)."""
    loss = iterate_loss(out_type, gt_states, gt_actions, mask, states, actions)
    return loss, jnp.zeros(())
