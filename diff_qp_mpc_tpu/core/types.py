"""Core problem pytrees.

TPU-native analogs of the reference's namedtuples and module state
(reference: qpth/al_utils.py:8-13 QuadCost/LinDx; qpth/AL_mpc.py:193-195,
250-252,314-318 warm-start module attributes — here made *explicit carried
state* so everything stays functional under jit/scan/shard_map).

Conventions
-----------
- batch-major layout ``[bsz, T, ...]`` everywhere (the reference mixes
  time-major ``[T, bsz]`` in qp_wrapper and batch-major in AL_mpc; one
  convention keeps vmap/sharding trivial: the leading axis is always the
  data-parallel axis).
- a trajectory decision variable is ``xu`` with shape ``[bsz, T, nx+nu]``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


def _pytree_dataclass(cls):
    """Register a frozen dataclass as a JAX pytree node."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return [getattr(obj, n) for n in fields], None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class QuadCost:
    """Dense quadratic cost  ½ τᵀ C τ + cᵀ τ  per time step.

    C: [bsz, T, n, n], c: [bsz, T, n] with n = nx + nu.
    (reference: qpth/al_utils.py:8, qpth/qp_wrapper.py QuadCost)
    """

    C: jnp.ndarray
    c: jnp.ndarray


@_pytree_dataclass
class DiagQuadCost:
    """Diagonal quadratic cost — the form the DEQ-MPC training path uses.

    Cd: [bsz, T, n] diagonal entries, c: [bsz, T, n].
    (reference: AL_mpc.py:247 converts dense C to its diagonal)
    """

    Cd: jnp.ndarray
    c: jnp.ndarray


@_pytree_dataclass
class LinDx:
    """Linear (affine) dynamics x' = F [x;u] + f.

    F: [bsz, T-1, nx, nx+nu], f: [bsz, T-1, nx].
    (reference: qpth/al_utils.py:9)
    """

    F: jnp.ndarray
    f: jnp.ndarray


@_pytree_dataclass
class Bounds:
    """Box bounds on controls (and optionally states).

    u_lo/u_hi: [nu] or [bsz, T, nu]; x_lo/x_hi optional.
    (reference: qpth/AL_mpc.py:149-152)
    """

    u_lo: jnp.ndarray
    u_hi: jnp.ndarray
    x_lo: Optional[jnp.ndarray] = None
    x_hi: Optional[jnp.ndarray] = None


@_pytree_dataclass
class Lambdas:
    """Structured AL multipliers (reference keeps one flat vector,
    qpth/AL_mpc.py:193; structured pytree avoids index bookkeeping).

    lam_dyn:  [bsz, T-1, nx]  multipliers on x_{t+1} - f(x_t,u_t) = 0
    lam_init: [bsz, nx]       multipliers on x_0 - x0 = 0
    lam_hi:   [bsz, T, nu]    multipliers on u - u_hi <= 0
    lam_lo:   [bsz, T, nu]    multipliers on u_lo - u <= 0
    """

    lam_dyn: jnp.ndarray
    lam_init: jnp.ndarray
    lam_hi: jnp.ndarray
    lam_lo: jnp.ndarray

    @staticmethod
    def zeros(bsz: int, T: int, nx: int, nu: int, dtype=jnp.float32) -> "Lambdas":
        return Lambdas(
            lam_dyn=jnp.zeros((bsz, T - 1, nx), dtype),
            lam_init=jnp.zeros((bsz, nx), dtype),
            lam_hi=jnp.zeros((bsz, T, nu), dtype),
            lam_lo=jnp.zeros((bsz, T, nu), dtype),
        )

    def flat(self) -> jnp.ndarray:
        bsz = self.lam_init.shape[0]
        return jnp.concatenate(
            [
                self.lam_dyn.reshape(bsz, -1),
                self.lam_init.reshape(bsz, -1),
                self.lam_hi.reshape(bsz, -1),
                self.lam_lo.reshape(bsz, -1),
            ],
            axis=-1,
        )


@_pytree_dataclass
class ALState:
    """Warm-start carry for the AL-MPC solver across receding-horizon calls.

    The reference stores this as torch module attributes
    (AL_mpc.py:250-252,314-318 x_init/u_init/lamda_prev/rho_prev and the
    cost/λ/ρ history consumed by warm_start_al, al_utils.py:16-34). Here it
    is an explicit pytree the caller threads through.

    ``hist_*`` are rolling histories of length ``hist_len`` (static), most
    recent entry last; ``hist_filled`` counts valid entries.
    """

    x: jnp.ndarray  # [bsz, T, nx] warm-start states
    u: jnp.ndarray  # [bsz, T, nu] warm-start controls
    lam: Lambdas
    rho: jnp.ndarray  # [bsz, 1]
    hist_cost: jnp.ndarray  # [H, bsz]
    hist_lam: Any  # Lambdas with extra leading H axis
    hist_rho: jnp.ndarray  # [H, bsz, 1]
    hist_filled: jnp.ndarray  # [] int32
    just_initialized: jnp.ndarray  # [] bool

    @staticmethod
    def init(
        bsz: int,
        T: int,
        nx: int,
        nu: int,
        hist_len: int = 3,  # = al_iter + 1: one solve's history exactly
        # (reference rebuilds cost_lam_hist each solve, AL_mpc.py:282,314)
        dtype=jnp.float32,
    ) -> "ALState":
        lam = Lambdas.zeros(bsz, T, nx, nu, dtype)
        return ALState(
            x=jnp.zeros((bsz, T, nx), dtype),
            u=jnp.zeros((bsz, T, nu), dtype),
            lam=lam,
            rho=jnp.ones((bsz, 1), dtype),
            hist_cost=jnp.full((hist_len, bsz), jnp.inf, dtype),
            hist_lam=jax.tree.map(
                lambda a: jnp.zeros((hist_len,) + a.shape, a.dtype), lam
            ),
            hist_rho=jnp.ones((hist_len, bsz, 1), dtype),
            hist_filled=jnp.zeros((), jnp.int32),
            just_initialized=jnp.ones((), bool),
        )


@_pytree_dataclass
class SolveStats:
    """Per-solve diagnostics (reference prints these ad hoc,
    e.g. AL_mpc.py:304; here they are a first-class return)."""

    dyn_res: jnp.ndarray  # [bsz] final clamped constraint-residual norm
    cost: jnp.ndarray  # [bsz] final objective
    merit: jnp.ndarray  # [bsz] final merit value
    newton_steps: jnp.ndarray  # [] total Newton iterations executed
    step_size: jnp.ndarray  # [bsz] last accepted line-search step


def ctrl_dims(x: jnp.ndarray, u: jnp.ndarray):
    """(bsz, T, nx, nu) from batched trajectories."""
    bsz, T, nx = x.shape
    nu = u.shape[-1]
    return bsz, T, nx, nu
