"""Multi-host input sharding (per-host data feeding).

Equivalent of the reference's distributed input stack
(`DistributedSampler` epoch-sharded indices + `init_random_seed`
rank-broadcast, apis/train.py:27-55,222-233): in a multi-host TPU pod
each process loads ONLY the samples for its local devices and the
global batch is assembled as one sharded jax.Array — no host ever
materializes the full batch.

Single-host (process_count=1) degenerates to the plain path, so the
same training loop runs everywhere (tools/train.py).
"""

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

__all__ = ['host_shard_indices', 'global_batch_from_local',
           'broadcast_seed', 'local_batch_size']


def host_shard_indices(num_samples, epoch, seed=0, drop_last=True,
                       process_index=None, process_count=None):
    """Per-epoch deterministic sample indices for THIS host.

    Mirrors torch DistributedSampler semantics (shuffle by epoch seed,
    pad to a multiple of world size, round-robin split) so runs are
    reproducible across host counts.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    rng = np.random.RandomState(seed + epoch)
    order = rng.permutation(num_samples)
    if drop_last:
        usable = (num_samples // pc) * pc
        order = order[:usable]
    else:
        pad = (-len(order)) % pc
        if pad:
            order = np.concatenate([order, order[:pad]])
    return order[pi::pc]


def local_batch_size(global_batch, mesh):
    """Samples this host contributes per step."""
    n_local = len([d for d in mesh.devices.flat
                   if d.process_index == jax.process_index()])
    n_total = mesh.devices.size
    assert global_batch % n_total == 0, (global_batch, n_total)
    return global_batch // n_total * n_local


def global_batch_from_local(local_batch, mesh, axis_name=DATA_AXIS):
    """Assemble a globally-sharded batch from per-host local arrays.

    Every leaf's leading axis is the LOCAL batch; the returned arrays
    are global jax.Arrays sharded over the mesh's data axis, each
    shard resident on the host that produced it.
    """
    def put(x):
        x = np.asarray(x)
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)
    return jax.tree.map(put, local_batch)


def broadcast_seed(seed):
    """Agree on one seed across hosts (reference init_random_seed's
    rank-0 broadcast). Uses a tiny all-reduce over the default mesh."""
    if jax.process_count() == 1:
        return int(seed)
    from jax.experimental import multihost_utils
    arr = np.asarray([seed], np.int64)
    return int(multihost_utils.broadcast_one_to_all(arr)[0])
