"""PointRCNN two-stage detector + FP neck + point coder."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.models.detectors.point_rcnn import (PointRCNN,
                                                 PointRCNNConfig,
                                                 point_coder_decode,
                                                 point_coder_encode,
                                                 point_rcnn_loss,
                                                 point_rcnn_predict)

MS = ((3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73))


def test_point_coder_roundtrip():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(32, 3).astype(np.float32) * 5)
    labels = jnp.asarray(rng.randint(0, 3, 32))
    boxes = jnp.asarray(np.concatenate([
        rng.randn(32, 3).astype(np.float32) * 5,
        rng.uniform(0.5, 4, (32, 3)).astype(np.float32),
        rng.uniform(-3, 3, (32, 1)).astype(np.float32)], axis=1))
    enc = point_coder_encode(boxes, pts, labels, MS)
    dec = point_coder_decode(enc, pts, labels, MS)
    err = jnp.abs(dec[:, :6] - boxes[:, :6]).max()
    assert float(err) < 1e-4
    dy = jnp.arctan2(jnp.sin(dec[:, 6] - boxes[:, 6]),
                     jnp.cos(dec[:, 6] - boxes[:, 6]))
    assert float(jnp.abs(dy).max()) < 1e-4


@pytest.fixture(scope='module')
def tiny():
    cfg = PointRCNNConfig(
        num_proposals=8, roi_num_points=32, max_num=8,
        sa_points=(64, 32, 16, 8),
        sa_radii=((0.5, 1.0), (1.0, 2.0), (2.0, 4.0), (4.0, 8.0)),
        sa_samples=((4, 8), (4, 8), (4, 8), (4, 8)))
    model = PointRCNN(cfg=cfg)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(1, 128, 3).astype(np.float32) *
                      np.array([30, 20, 3]) - np.array([0, 10, 2]))
    v = model.init(jax.random.PRNGKey(0), pts, train=True)
    return cfg, model, v, pts


def test_point_rcnn_forward_shapes(tiny):
    cfg, model, v, pts = tiny
    out, _ = model.apply(v, pts, train=True, mutable=['batch_stats'])
    assert out['cls_pred'].shape == (1, 128, 3)
    assert out['reg_pred'].shape == (1, 128, 8)
    assert out['proposals'].shape == (1, 8, 7)
    assert out['rcnn_cls'].shape == (1, 8)
    assert out['rcnn_reg'].shape == (1, 8, 7)


def test_point_rcnn_loss_and_grad(tiny):
    cfg, model, v, pts = tiny
    batch = dict(
        gt_boxes=jnp.asarray([[[10.0, 0, -1, 3.9, 1.6, 1.5, 0.2],
                               [20.0, 5, -1, 0.8, 0.6, 1.7, 0.0]]]),
        gt_labels=jnp.asarray([[0, 1]]),
        gt_mask=jnp.asarray([[True, True]]))

    def loss_fn(params):
        out, _ = model.apply({'params': params,
                              'batch_stats': v['batch_stats']},
                             pts, train=True, mutable=['batch_stats'])
        total, losses = point_rcnn_loss(out, batch, cfg)
        return total, losses

    (total, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(v['params'])
    assert np.isfinite(float(total))
    for k, val in losses.items():
        assert np.isfinite(float(val)), k
    gn = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                      for g in jax.tree_util.tree_leaves(grads)))
    assert np.isfinite(float(gn)) and float(gn) > 0


def test_point_rcnn_predict(tiny):
    cfg, model, v, pts = tiny
    out = model.apply(v, pts, train=False)
    det = point_rcnn_predict(out, cfg)
    assert det['boxes3d'].shape == (1, 8, 7)
    assert det['scores'].shape == (1, 8)
    for x in jax.tree_util.tree_leaves(det):
        assert np.isfinite(np.asarray(x, np.float32)).all()


# compile-heavy: full tier only
pytestmark = pytest.mark.slow
