"""3DSSD: fusion sampling, MSG grouping, forward/loss/predict.

Reference surfaces covered: PointNet2SAMSG fusion sampling
(mmdet3d/models/backbones/pointnet2_sa_msg.py), dilated ball query
(mmcv PointSAModuleMSG), SSD3DHead forward/loss/decode
(mmdet3d/models/dense_heads/ssd_3d_head.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.models.backbones.pointnet2 import ball_group
from dfm_tpu.models.backbones.pointnet2_msg import sample_centers
from dfm_tpu.models.detectors.ssd3d import (SSD3DConfig, SSD3DNet,
                                            ssd3d_loss, ssd3d_predict)


def _tiny_cfg():
    return SSD3DConfig(
        num_classes=2, num_candidates=16,
        sa_num_points=((128,), (32,), (16, 16)),
        sa_radii=((0.4, 0.8), (0.8, 1.6), (1.6, 4.8)),
        sa_num_samples=((8, 8), (8, 8), (8, 8)),
        sa_channels=(((8, 16), (8, 16)), ((16, 32), (16, 32)),
                     ((32, 32), (32, 32))),
        sa_aggregation=(16, 32, 64),
        sa_fps_mods=(('D-FPS',), ('FS',), ('F-FPS', 'D-FPS')),
        sa_fps_ranges=((-1,), (-1,), (32, -1)),
        agg_radii=(1.6, 3.2), agg_ks=(4, 8),
        agg_mlps=((32, 32), (32, 64)),
        shared_channels=(32, 32),
        nms_pre=16, max_num=8)


def test_fusion_sampling_modes():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.random((64, 3), dtype=np.float32))
    feats = jnp.asarray(rng.random((64, 8), dtype=np.float32))
    # D-FPS: unique indices, first is 0
    idx = sample_centers(xyz, feats, ('D-FPS',), (-1,), (8,))
    assert idx.shape == (8,)
    assert len(np.unique(np.asarray(idx))) == 8
    # FS: 2x output (F-FPS + D-FPS concat)
    idx = sample_centers(xyz, feats, ('FS',), (-1,), (8,))
    assert idx.shape == (16,)
    # ranged two-mod: F-FPS over [0, 32), D-FPS over [32, 64)
    idx = sample_centers(xyz, feats, ('F-FPS', 'D-FPS'), (32, -1),
                         (4, 4))
    assert idx.shape == (8,)
    assert np.all(np.asarray(idx[:4]) < 32)
    assert np.all(np.asarray(idx[4:]) >= 32)


def test_dilated_ball_query_excludes_inner():
    # ring of points at r=1 and r=3 around the origin
    th = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    inner = np.stack([np.cos(th), np.sin(th), 0 * th], 1)
    outer = 3 * inner
    xyz = jnp.asarray(np.concatenate([inner, outer]).astype(np.float32))
    ctr = jnp.zeros((1, 3))
    g = ball_group(xyz, None, ctr, radius=4.0, k=16, min_radius=2.0)
    # all grouped rel-coords must have norm ~3 (outer ring only)
    norms = np.linalg.norm(np.asarray(g)[0], axis=-1)
    assert np.all(norms > 2.0)


def test_forward_loss_predict_shapes():
    cfg = _tiny_cfg()
    model = SSD3DNet(cfg=cfg)
    rng = np.random.default_rng(1)
    b, n = 2, 512
    pts = jnp.asarray(rng.random((b, n, 4), dtype=np.float32) * 10)
    variables = model.init(jax.random.PRNGKey(0), pts, train=False)
    out = model.apply(variables, pts, train=False)
    p = cfg.num_candidates
    assert out['cls_score'].shape == (b, p, cfg.num_classes)
    assert out['center_offset'].shape == (b, p, 3)
    assert out['dir_class'].shape == (b, p, cfg.num_dir_bins)

    g = 4
    gt = np.concatenate([
        rng.random((b, g, 3), dtype=np.float32) * 8 + 1,
        rng.uniform(1, 3, (b, g, 3)).astype(np.float32),
        rng.uniform(-np.pi, np.pi, (b, g, 1)).astype(np.float32)], -1)
    batch = dict(points=pts, gt_boxes=jnp.asarray(gt),
                 gt_labels=jnp.zeros((b, g), jnp.int32),
                 gt_mask=jnp.ones((b, g), bool))
    total, losses = ssd3d_loss(out, batch, cfg)
    assert np.isfinite(float(total))
    for k in ('loss_centerness', 'loss_center', 'loss_corner',
              'loss_vote', 'loss_dir_cls'):
        assert k in losses and np.isfinite(float(losses[k])), k

    det = ssd3d_predict(out, cfg)
    assert det['boxes_3d'].shape == (b, cfg.max_num, 7)
    assert np.isfinite(np.asarray(det['scores_3d'])).all()


def test_gradients_flow():
    cfg = _tiny_cfg()
    model = SSD3DNet(cfg=cfg)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.random((1, 256, 4), dtype=np.float32) * 10)
    variables = model.init(jax.random.PRNGKey(0), pts, train=False)
    gt = jnp.asarray(np.array(
        [[[5, 0, -1, 2, 2, 1.5, 0.3]]], np.float32))
    batch = dict(points=pts, gt_boxes=gt,
                 gt_labels=jnp.zeros((1, 1), jnp.int32),
                 gt_mask=jnp.ones((1, 1), bool))

    def f(params):
        out, _ = model.apply(
            {'params': params,
             'batch_stats': variables['batch_stats']},
            pts, train=True, mutable=['batch_stats'])
        return ssd3d_loss(out, batch, cfg)[0]

    grads = jax.grad(f)(variables['params'])
    gmax = max(float(jnp.abs(g).max())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gmax) and gmax > 0


def test_config_builds():
    from dfm_tpu.models import build_detector
    from dfm_tpu.runtime.config import load_config
    cfg = load_config(os.path.join(os.path.dirname(__file__), '..',
                                   'configs', 'ssd3d_kitti_car.py'))
    h = build_detector(cfg.model.to_dict())
    assert h.type == 'SSD3DNet'
    assert h.cfg.num_classes == 1
