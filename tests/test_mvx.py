"""MVX multi-modal detector: point fusion + voxel pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.models.detectors.mvx_two_stage import (MVXConfig,
                                                    MVXFasterRCNN,
                                                    mvx_loss,
                                                    mvx_predict,
                                                    point_fusion_sample)


def test_point_fusion_sample_projects():
    h, w = 32, 48
    feat = jnp.asarray(np.arange(h * w * 4, dtype=np.float32)
                       .reshape(h, w, 4)) / 100
    l2i = np.eye(4, dtype=np.float32)
    l2i[0, 0] = l2i[1, 1] = 20.0
    l2i[0, 2] = w / 2
    l2i[1, 2] = h / 2
    pts = jnp.asarray([[0.0, 0.0, 5.0],      # center pixel
                       [100.0, 0.0, 5.0],    # off image
                       [0.0, 0.0, -1.0]])    # behind camera
    out, valid = point_fusion_sample(feat, pts, jnp.asarray(l2i), (h, w))
    assert bool(valid[0]) and not bool(valid[1]) and not bool(valid[2])
    # center projection samples the feature at (w/2, h/2) scaled
    ref = feat[h // 2, w // 2]
    assert float(jnp.abs(out[0] - ref).max()) < 1e-3
    assert float(jnp.abs(out[1]).max()) == 0.0


@pytest.fixture(scope='module')
def tiny():
    cfg = MVXConfig(
        num_classes=3,
        point_cloud_range=(0, -8, -3, 16, 8, 1),
        voxel_size=(0.8, 0.8, 0.5),
        cv_channels=8, bev_channels=16,
        img_backbone_depth=18, img_channels=16, fusion_mid=16,
        anchor_ranges=((0, -8, -0.6, 16, 8, -0.6),) * 3,
        anchor_sizes=((0.8, 0.6, 1.73), (1.76, 0.6, 1.73),
                      (3.9, 1.6, 1.56)),
        nms_pre=64, max_num=16)
    model = MVXFasterRCNN(cfg=cfg)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(1, 256, 3).astype(np.float32) *
                      np.array([16, 16, 4]) - np.array([0, 8, 3]))
    mask = jnp.ones((1, 256), bool)
    img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    # camera looking down +x of the lidar frame: cam (x,y,z) =
    # (-y_l, -z_l, x_l), K with principal point at the image center
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = k[1, 1] = 40.0
    k[0, 2] = 48.0
    k[1, 2] = 32.0
    swap = np.array([[0, -1, 0, 0], [0, 0, -1, 0],
                     [1, 0, 0, 0], [0, 0, 0, 1]], np.float32)
    l2i = (k @ swap)[None]
    v = model.init(jax.random.PRNGKey(0), pts, mask, img,
                   jnp.asarray(l2i), train=True)
    return cfg, model, v, (pts, mask, img, jnp.asarray(l2i))


def test_mvx_forward_loss_grad(tiny):
    cfg, model, v, args = tiny
    outs, _ = model.apply(v, *args, train=True, mutable=['batch_stats'])
    assert outs['cls_score'].ndim == 4
    batch = dict(
        gt_boxes=jnp.asarray([[[8.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0],
                               [4.0, 2.0, -1.0, 0.8, 0.6, 1.73, 0.0]]]),
        gt_labels=jnp.asarray([[2, 0]]),
        gt_mask=jnp.asarray([[True, True]]))

    def loss_fn(params):
        o, _ = model.apply({'params': params,
                            'batch_stats': v['batch_stats']},
                           *args, train=True, mutable=['batch_stats'])
        return mvx_loss(o, batch, cfg)

    (total, losses), g = jax.value_and_grad(
        loss_fn, has_aux=True)(v['params'])
    assert np.isfinite(float(total))
    gn = jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                      for x in jax.tree_util.tree_leaves(g)))
    assert np.isfinite(float(gn)) and float(gn) > 0
    # fusion gradients flow into the image branch
    img_g = g['img_backbone']
    ign = max(float(jnp.abs(x).max())
              for x in jax.tree_util.tree_leaves(img_g))
    assert ign > 0


def test_mvx_predict(tiny):
    cfg, model, v, args = tiny
    outs = model.apply(v, *args, train=False)
    det = mvx_predict(outs, cfg)
    for x in jax.tree_util.tree_leaves(det):
        assert np.isfinite(np.asarray(x, np.float32)).all()


# compile-heavy: full tier only
pytestmark = pytest.mark.slow
