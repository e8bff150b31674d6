"""Multi-device tests on the 8-virtual-CPU mesh (conftest forces it).

Covers SURVEY.md §2.10 (data-parallel training, dist_reduce_mean
semantics): mesh construction, batch sharding, state replication,
sharded-vs-single-device train-step equivalence, the pmean normalizer
path under shard_map, and the driver's dryrun_multichip hook itself.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from dfm_tpu.parallel import (create_mesh, data_parallel_specs, replicate,
                              shard_batch)
from dfm_tpu.runtime import create_train_state, make_optimizer, make_train_step


def test_eight_devices_available():
    assert jax.default_backend() == 'cpu'
    assert len(jax.devices()) >= 8


def test_create_mesh_and_shard_batch():
    mesh = create_mesh(jax.devices()[:8])
    assert mesh.shape == {'data': 8}
    batch = dict(x=jnp.ones((16, 4, 3)), y=jnp.arange(16))
    sharded = shard_batch(batch, mesh)
    assert sharded['x'].sharding == NamedSharding(mesh, P('data', None, None))
    assert sharded['y'].sharding == NamedSharding(mesh, P('data'))
    np.testing.assert_array_equal(np.asarray(sharded['y']), np.arange(16))
    # each device holds 16/8 = 2 rows of x
    shard = sharded['x'].addressable_shards[0]
    assert shard.data.shape == (2, 4, 3)


def test_replicate():
    mesh = create_mesh(jax.devices()[:8])
    tree = dict(w=jnp.ones((3, 3)), b=jnp.zeros((3,)))
    rep = replicate(tree, mesh)
    assert rep['w'].sharding == NamedSharding(mesh, P())
    assert all(s.data.shape == (3, 3) for s in rep['w'].addressable_shards)


class _ToyNet(nn.Module):
    """Small conv net with BatchNorm to exercise the batch_stats path."""

    @nn.compact
    def __call__(self, img, meta, train=False):
        x = nn.Conv(8, (3, 3))(img)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        return nn.Dense(1)(x.mean(axis=(1, 2)))


def _toy_loss(outputs, batch, rng):
    loss = jnp.mean((outputs[:, 0] - batch['target']) ** 2)
    return loss, dict(mse=loss)


def _toy_batch(b=8):
    rng = np.random.RandomState(0)
    return dict(img=jnp.asarray(rng.randn(b, 8, 8, 3).astype(np.float32)),
                meta=None,
                target=jnp.asarray(rng.randn(b).astype(np.float32)))


def test_dp_train_step_matches_single_device():
    """The sharded jit step must be numerically equivalent to the
    unsharded one — XLA inserts the gradient all-reduce; semantics are
    unchanged."""
    model = _ToyNet()
    batch = _toy_batch(8)
    variables = model.init(jax.random.PRNGKey(0), batch['img'], None,
                           train=False)
    # SGD, not AdamW: AdamW's first step is sign-like and amplifies
    # reduction-order noise (~1e-9) in exactly-zero grads to full lr.
    tx = optax.sgd(1e-2)
    step_fn = make_train_step(model, _toy_loss, donate=False)
    rng = jax.random.PRNGKey(1)

    state1 = create_train_state(variables, tx)
    state1, metrics1 = step_fn(state1, batch, rng)

    mesh = create_mesh(jax.devices()[:8])
    state2 = create_train_state(variables, tx)
    with mesh:
        state2 = replicate(state2, mesh)
        sharded = shard_batch(batch, mesh)
        state2, metrics2 = step_fn(state2, sharded, rng)

    np.testing.assert_allclose(float(metrics1['loss']),
                               float(metrics2['loss']), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5),
        state1.params, jax.device_get(state2.params))
    # batch_stats must also be globally synced (SyncBN semantics)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-5),
        state1.batch_stats, jax.device_get(state2.batch_stats))


def test_data_parallel_specs():
    mesh = create_mesh(jax.devices()[:8])
    batch = _toy_batch(8)
    state = dict(w=jnp.ones((3,)))
    batch_s, state_s = data_parallel_specs(batch, state, mesh)
    assert batch_s['img'] == NamedSharding(mesh, P('data', None, None, None))
    assert state_s['w'] == NamedSharding(mesh, P())


def test_imitation_pmean_normalizer_under_shard_map():
    """The dist_reduce_mean path: per-shard normalizers pmean'd across
    the mesh must reproduce the global-batch loss exactly."""
    from dfm_tpu.models.detectors.imitation import imitation_loss

    rng = np.random.RandomState(2)
    b, ny, nx, c, g = 8, 8, 8, 4, 3
    student = jnp.asarray(rng.randn(b, ny, nx, c).astype(np.float32))
    teacher = jnp.asarray(
        (rng.randn(b, ny, nx, c) * (rng.rand(b, ny, nx, 1) > 0.3))
        .astype(np.float32))
    xs = (np.arange(nx) + 0.5).astype(np.float32)
    ys = (np.arange(ny) + 0.5).astype(np.float32)
    centers = jnp.asarray(
        np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2))
    gt = np.zeros((b, g, 7), np.float32)
    gt[..., 0] = rng.rand(b, g) * nx
    gt[..., 1] = rng.rand(b, g) * ny
    gt[..., 3:6] = 2.0
    gt_boxes = jnp.asarray(gt)
    gt_mask = jnp.asarray(rng.rand(b, g) > 0.3)

    global_loss = float(imitation_loss(student, teacher, centers,
                                       gt_boxes, gt_mask))

    mesh = create_mesh(jax.devices()[:8])

    @jax.jit
    def sharded_loss(student, teacher, gt_boxes, gt_mask):
        def per_shard(student, teacher, gt_boxes, gt_mask):
            loss = imitation_loss(student, teacher, centers, gt_boxes,
                                  gt_mask, axis_name='data')
            return jax.lax.pmean(loss, 'data')
        return shard_map(
            per_shard, mesh=mesh,
            in_specs=(P('data'), P('data'), P('data'), P('data')),
            out_specs=P())(student, teacher, gt_boxes, gt_mask)

    sharded = float(sharded_loss(student, teacher, gt_boxes, gt_mask))
    assert sharded == pytest.approx(global_loss, rel=1e-5)


def test_driver_dryrun_multichip():
    """Run the exact driver hook on the 8-device CPU mesh."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


# compile-heavy: full tier only (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow
