"""Multi-host input sharding (parallel/multihost.py).

Index-sharding semantics are validated against simulated process
counts; the global-batch assembly runs for real on the 8-device CPU
mesh (single process, which is exactly the degenerate case the
training loop uses everywhere).
"""

import jax
import numpy as np

from dfm_tpu.parallel.mesh import create_mesh, DATA_AXIS
from dfm_tpu.parallel.multihost import (broadcast_seed,
                                        global_batch_from_local,
                                        host_shard_indices,
                                        local_batch_size)


def test_host_shards_partition_the_epoch():
    n, pc = 103, 4
    shards = [host_shard_indices(n, epoch=3, seed=7, process_index=i,
                                 process_count=pc) for i in range(pc)]
    allidx = np.concatenate(shards)
    # drop_last: 100 usable samples, no overlap between hosts
    assert len(allidx) == (n // pc) * pc
    assert len(np.unique(allidx)) == len(allidx)
    # deterministic per (seed, epoch); different across epochs
    again = host_shard_indices(n, epoch=3, seed=7, process_index=2,
                               process_count=pc)
    np.testing.assert_array_equal(shards[2], again)
    other = host_shard_indices(n, epoch=4, seed=7, process_index=2,
                               process_count=pc)
    assert not np.array_equal(shards[2], other)


def test_no_drop_last_pads_round_robin():
    n, pc = 10, 4
    shards = [host_shard_indices(n, 0, drop_last=False, process_index=i,
                                 process_count=pc) for i in range(pc)]
    assert all(len(s) == 3 for s in shards)


def test_global_batch_assembly_on_mesh():
    mesh = create_mesh()
    n_dev = mesh.devices.size
    gb = 2 * n_dev
    lb = local_batch_size(gb, mesh)
    assert lb == gb  # single-process: host feeds everything
    batch = dict(img=np.arange(gb * 6, dtype=np.float32).reshape(gb, 6),
                 label=np.arange(gb, dtype=np.int32))
    garr = global_batch_from_local(batch, mesh)
    assert garr['img'].shape == (gb, 6)
    assert garr['img'].sharding.spec == jax.sharding.PartitionSpec(
        DATA_AXIS, None)
    np.testing.assert_array_equal(np.asarray(garr['label']),
                                  batch['label'])
    # sharded arrays feed jit directly
    s = jax.jit(lambda b: b['img'].sum() + b['label'].sum())(garr)
    assert np.isfinite(float(s))


def test_broadcast_seed_single_process():
    assert broadcast_seed(42) == 42
