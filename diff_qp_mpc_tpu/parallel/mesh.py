"""Device mesh + batch-axis sharding.

The reference is single-process single-GPU (SURVEY.md §2.6: no NCCL/MPI/
torch.distributed anywhere); its only parallel axis is the universal
``nBatch`` leading dimension. The TPU-native scale-out story: every QP in
the batch is independent, so the batch axis shards over a 1-D ``data``
mesh with NamedSharding and jit inserts the (only) collectives — psum/mean
reductions for losses and logging scalars — over ICI. Multi-host extends
the same mesh via jax.distributed.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Place every array in the pytree with its leading axis sharded over
    the mesh (arrays with a leading axis not divisible by the mesh size are
    replicated — e.g. scalars/configs)."""
    n = mesh.devices.size
    sh_b = batch_sharding(mesh, axis)
    sh_r = replicated(mesh)

    def place(a):
        a = jax.numpy.asarray(a)
        if a.ndim >= 1 and a.shape[0] % n == 0 and a.shape[0] > 0:
            return jax.device_put(a, sh_b)
        return jax.device_put(a, sh_r)

    return jax.tree.map(place, tree)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (jax.distributed). No-op when single-process args
    are absent — call unconditionally at program start."""
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
