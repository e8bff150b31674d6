"""Device mesh + sharding helpers (data parallelism over ICI/DCN).

TPU-native replacement for the reference's NCCL stack (SURVEY.md 2.10:
MMDistributedDataParallel gradient all-reduce, DistributedSampler,
dist_reduce_mean, SyncBN): one `jax.sharding.Mesh` with a `data` axis;
batches are sharded on their leading axis, parameters replicated, and
XLA inserts the gradient all-reduces. Works identically on a single
host, a TPU slice (ICI), or multi-slice (DCN) — the mesh abstracts the
fabric.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['create_mesh', 'shard_batch', 'replicate', 'data_parallel_specs']

DATA_AXIS = 'data'


def create_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Shard every array's leading (batch) axis across the mesh."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters/optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_specs(batch_tree, state_tree, mesh: Mesh,
                        axis_name: str = DATA_AXIS):
    """(in_shardings, state_shardings) for jit: batch sharded on dim 0,
    state replicated."""
    batch_s = jax.tree.map(
        lambda x: NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1)))),
        batch_tree)
    state_s = jax.tree.map(lambda x: NamedSharding(mesh, P()), state_tree)
    return batch_s, state_s
