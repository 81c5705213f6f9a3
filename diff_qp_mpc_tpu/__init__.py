"""diff_qp_mpc_tpu — a TPU-native differentiable QP-MPC framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
swami1995/diff-qp-mpc (a differentiable nonlinear-MPC library built on the
OptNet qpth QP layer):

- ``ops``      batched block-tridiagonal Riccati/Cholesky KKT kernels,
               interior-point and augmented-Lagrangian Newton numerics
               (reference: qpth/solvers/pdipm/*, qpth/al_utils.py)
- ``solvers``  differentiable QP layer + three nonlinear MPC outer loops
               (reference: qpth/qp.py, qpth/qp_wrapper.py, qpth/AL_mpc.py,
               qpth/sl1qp_mpc.py)
- ``models``   analytic dynamics with jacfwd Jacobians (reference:
               qpth/env_dx/*, deqmpc/envs*.py, deqmpc/my_envs/*,
               deqmpc/rex_quadrotor.py)
- ``envs``     gym-like batched environments
- ``learning`` DEQ-MPC policies, losses, data pipeline, training
               (reference: deqmpc/policies.py, train.py, datagen.py)
- ``parallel`` device-mesh sharding of the batch axis (no analog in the
               reference, which is single-GPU)
- ``utils``    config, profiling, checkpointing

Design stance (not a port): everything is a pure function over pytrees;
``vmap`` carries the batch, ``lax.scan`` carries horizon/iteration loops,
``custom_vjp`` implements the OptNet implicit backward, and the batch axis
shards over a ``jax.sharding.Mesh`` with ``shard_map``.
"""

__version__ = "0.1.0"

from diff_qp_mpc_tpu.core.types import (  # noqa: F401
    QuadCost,
    DiagQuadCost,
    LinDx,
    Bounds,
    ALState,
    SolveStats,
)
