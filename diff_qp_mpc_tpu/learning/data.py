"""Expert-trajectory data pipeline.

Rebuild of deqmpc/datagen.py:278-408 (save_expert_traj / get_gt_data /
merge_gt_data / sample_trajectory), format-compatible with the reference's
pickled datasets (``data/expert_traj_<type>-<spec_id>_new.pkl``: a list of
trajectories, each a list of (state, action) pairs — numpy arrays or torch
tensors, both accepted).

The sampler reproduces the reference semantics exactly: uniform random
start indices into the concatenated data, windows crossing an episode end
get masked out from the crossing point on (cumulative product of the
per-step masks, datagen.py:404-405), windows running past the data end are
zero-padded. Sampling is pure numpy on host (it's data loading); the
returned batch is device-ready.
"""
from __future__ import annotations

import pickle
from typing import Dict, List, Sequence, Tuple

import numpy as np

Array = np.ndarray


def _to_numpy(a) -> Array:
    if hasattr(a, "detach"):  # torch tensor from reference pickles
        return a.detach().cpu().numpy()
    return np.asarray(a)


def merge_trajectories(trajs: Sequence[Sequence[Tuple]]) -> Dict[str, Array]:
    """List-of-trajectories → flat arrays + mask (0 marks episode ends)
    (datagen.py:329-355 merge_gt_data)."""
    states, actions, mask = [], [], []
    for traj in trajs:
        for state, action in traj:
            states.append(_to_numpy(state).reshape(-1))
            actions.append(_to_numpy(action).reshape(-1))
            mask.append(1.0)
        mask[-1] = 0.0
    return {
        "state": np.asarray(states, np.float32),
        "action": np.asarray(actions, np.float32),
        "mask": np.asarray(mask, np.float32),
    }


def load_expert_pickle(path: str) -> Dict[str, Array]:
    """Load a reference-format expert pickle and merge it.

    ``path`` may be a comma-separated list; the datasets are concatenated
    (each episode keeps its terminating mask=0, so windows never cross a
    dataset boundary). Used to mix e.g. a swing-up expert set with a
    goal-holding stabilize set for the same robot.
    """
    if "," in path:
        parts = [load_expert_pickle(p) for p in path.split(",") if p]
        return {k: np.concatenate([d[k] for d in parts], axis=0)
                for k in parts[0]}
    with open(path, "rb") as f:
        trajs = pickle.load(f)
    if isinstance(trajs, dict):  # already merged
        return {k: _to_numpy(v) for k, v in trajs.items()}
    return merge_trajectories(trajs)


def save_expert_pickle(path: str, trajs: List[List[Tuple[Array, Array]]]):
    """datagen.py:307-308 format."""
    with open(path, "wb") as f:
        pickle.dump(trajs, f)


def sample_window_batch(data: Dict[str, Array], bsz: int, T: int,
                        rng: np.random.RandomState,
                        use_native: bool = True) -> Dict[str, Array]:
    """Random T-windows with cumulative masking (datagen.py:358-408).

    Uses the C++ threaded sampler (runtime/src/window_sampler.cpp) when the
    native library builds; falls back to this pure-Python path otherwise.
    """
    if use_native:
        from diff_qp_mpc_tpu import runtime

        out = runtime.sample_window_batch_native(
            data, bsz, T, int(rng.randint(0, 2**31)))
        if out is not None:
            return out
    N = len(data["state"])
    states, actions, masks = [], [], []
    while len(states) < bsz:
        i = int(rng.randint(0, N))
        if data["mask"][i] == 0:  # never start at an episode end
            continue
        if i + T <= N:
            s = data["state"][i:i + T]
            a = data["action"][i:i + T]
            m = data["mask"][i:i + T]
        else:
            pad = i + T - N
            z = lambda arr: np.concatenate(
                [arr[i:], np.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0)
            s, a, m = z(data["state"]), z(data["action"]), z(data["mask"])
        states.append(s)
        actions.append(a)
        masks.append(m)
    out = {
        "state": np.stack(states),
        "action": np.stack(actions),
        "mask": np.stack(masks),
    }
    # cumulative product: once masked, stay masked (datagen.py:404-405)
    out["mask"] = np.cumprod(out["mask"], axis=1)
    return out


def unwrap_window_angles(states: Array, mode: str) -> Array:
    """Phase-align wrapped angle coordinates along a sampled window.

    The reference's expert pickles store env-wrapped angles; its train loop
    re-aligns every sampled window so each trajectory lives in one winding
    (utils.unnormalize_states_pendulum:256-271 and
    unnormalize_states_cartpole_nlink:274-287, applied in train.py:141-146).
    Our own datasets are generated unwrapped, so this is a no-op on them —
    required only when consuming the reference's data/*.pkl files.

    states: [bsz, T, nx] numpy window batch.
    mode: "pendulum" (single angle at coord 0, offenders shifted by
    -sign(theta_t)*2pi, the reference's exact rule) or "cartpole" (angles at
    coords 1..nq_pos-1, shifted toward the previous angle; the reference's
    slice 1:nx//2+1 also sweeps in the cart velocity — an off-by-one we do
    not reproduce).
    """
    s = np.array(states, copy=True)
    if mode == "pendulum":
        cols = [0]
        sign = lambda cur, prev: np.sign(cur)
    elif mode == "cartpole":
        cols = list(range(1, s.shape[2] // 2))
        sign = lambda cur, prev: np.sign(cur - prev)
    else:
        raise ValueError(f"unknown unwrap mode {mode!r}")
    prev = s[:, 0, cols]
    for t in range(s.shape[1]):
        cur = s[:, t, cols]
        jump = np.abs(cur - prev) > np.pi / 2
        s[:, t, cols] = np.where(jump, cur - sign(cur, prev) * 2 * np.pi, cur)
        prev = s[:, t, cols]
    return s


# ---------------------------------------------------------------------------
# Reference torch checkpoint ingestion
# ---------------------------------------------------------------------------


def load_reference_torch_policy(path: str) -> Dict:
    """Torch-state-dict → flax-params adapter for the reference's shipped
    DEQ-MPC policy checkpoints (deqmpc/model/bc_sac_pen; saved by
    deqmpc/train.py:196 ``torch.save(policy.state_dict(), ...)`` and loaded
    back at train.py:127 / test.py:121).

    The reference policy is DEQMPCPolicy → self.model = DEQLayer (mlp,
    policies.py:426-437): ``model.inp_layer.{0,1}`` (Linear+LayerNorm input
    encoder), ``model.{fcdeq1,lndeq1,fcdeq2,lndeq2,lndeq3}`` (the weight-
    tied cell, policies.py:280-285), ``model.out_layer.0`` (output head).
    Returns ``{"params": ...}`` for this repo's DEQMPCPolicy with the same
    (T, hdim, out_type=1, layer_type="mlp") — verified numerically against
    the torch forward (tests/test_learning.py).

    Torch Linear stores weight [out, in]; flax Dense kernel is [in, out].
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    t = {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}

    def lin(prefix):
        return {"kernel": t[prefix + ".weight"].T.astype(np.float32),
                "bias": t[prefix + ".bias"].astype(np.float32)}

    def ln(prefix):
        return {"scale": t[prefix + ".weight"].astype(np.float32),
                "bias": t[prefix + ".bias"].astype(np.float32)}

    layer = {
        "Dense_0": lin("model.inp_layer.0"),
        "LayerNorm_0": ln("model.inp_layer.1"),
        "DEQCell_0": {
            "Dense_0": lin("model.fcdeq1"),
            "LayerNorm_0": ln("model.lndeq1"),
            "Dense_1": lin("model.fcdeq2"),
            # flax autonames in CONSTRUCTION order and Python constructs the
            # callee before its arguments, so in
            # ``LayerNorm()(relu(z1 + LayerNorm()(x + Dense(z1))))``
            # the OUTER LayerNorm is LayerNorm_1 (reference lndeq3) and the
            # inner one is LayerNorm_2 (reference lndeq2)
            "LayerNorm_1": ln("model.lndeq3"),
            "LayerNorm_2": ln("model.lndeq2"),
        },
        "Dense_1": lin("model.out_layer.0"),
    }
    return {"params": {"DEQLayer_0": layer}}
