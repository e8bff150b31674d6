"""Sparse 0.05 m teacher encoder (models/detectors/teacher.py).

Runs a scaled-down SparseLidarTeacher end-to-end and checks the
encoder's active-set bookkeeping and masked BN statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dfm_tpu.models.detectors.teacher import (SparseBN,
                                              SparseEncoder05,
                                              SparseLidarTeacher)


def test_sparse_encoder_tiny_forward():
    rng = np.random.RandomState(0)
    # tiny grid: (9, 16, 16) -> stages give (5,8,8) (3,4,4) (1,4,4)
    enc = SparseEncoder05(sparse_shape=(9, 16, 16))
    from dfm_tpu.ops.sparse_conv import sparse_voxelize_mean
    pts = jnp.asarray(rng.rand(2, 64, 3) *
                      jnp.asarray([4.0, 4.0, 2.0]), jnp.float32)
    mask = jnp.ones((2, 64), bool)
    pcr = jnp.asarray([0, 0, 0, 4, 4, 2], jnp.float32)
    keys, feats, vmask = jax.vmap(
        lambda p, m: sparse_voxelize_mean(
            p, m, pcr, (0.25, 0.25, 0.25), (9, 16, 16), 128))(pts, mask)
    v = enc.init(jax.random.PRNGKey(0), keys, feats, vmask)
    out = enc.apply(v, keys, feats, vmask)
    assert out.shape == (2, 1, 4, 4, 32)
    assert jnp.isfinite(out).all()


def test_sparse_lidar_teacher_interface():
    rng = np.random.RandomState(1)
    t = SparseLidarTeacher(
        point_cloud_range=(0, -2, -1, 4, 2, 1),
        voxel_size=(0.25, 0.25, 0.25),
        sparse_shape=(9, 16, 16),
        capacity=128, bev_channels=16)
    pts = jnp.asarray(rng.rand(1, 128, 3) *
                      jnp.asarray([4.0, 4.0, 2.0]) -
                      jnp.asarray([0.0, 2.0, 1.0]), jnp.float32)
    mask = jnp.ones((1, 128), bool)
    var = t.init(jax.random.PRNGKey(0), pts, mask)
    vol, bev = t.apply(var, pts, mask)
    assert vol.shape[0] == 1 and vol.shape[-1] == 32
    assert bev.shape[-1] == 16
    assert jnp.isfinite(vol).all() and jnp.isfinite(bev).all()
    # training mode updates running stats
    (vol_t, bev_t), updates = t.apply(var, pts, mask, train=True,
                                      mutable=['batch_stats'])
    assert 'batch_stats' in updates
    assert jnp.isfinite(vol_t).all()


def test_sparse_bn_masked_stats():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 4), jnp.float32)
    vmask = jnp.asarray([[True] * 5 + [False] * 3,
                         [True] * 8])
    bn = SparseBN(4)
    var = bn.init(jax.random.PRNGKey(0), x, vmask, train=True)
    y, upd = bn.apply(var, x, vmask, train=True,
                      mutable=['batch_stats'])
    valid = np.concatenate([np.asarray(x)[0, :5], np.asarray(x)[1]])
    want_mean = valid.mean(0)
    got = np.asarray(upd['batch_stats']['mean']) / 0.01  # momentum
    np.testing.assert_allclose(got, want_mean, rtol=1e-4, atol=1e-5)
    # dead slots zeroed
    assert float(np.abs(np.asarray(y)[0, 5:]).max()) == 0.0
    # valid entries normalized with the masked stats
    want = (valid - want_mean) / np.sqrt(valid.var(0) + 1e-3)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(y)[0, :5], np.asarray(y)[1]]),
        want, rtol=1e-3, atol=1e-4)


# compile-heavy: full tier only (pytest -m "not slow" skips)
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
