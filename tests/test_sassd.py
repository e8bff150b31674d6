"""SA-SSD: aux point-wise branch, losses, SECOND-identical test path.

Reference surfaces: detectors/sassd.py:14-136 (forward_train with
middle-encoder aux loss), SparseEncoderSASSD.aux_loss
(middle_encoders/sparse_encoder.py:636-681).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dfm_tpu.models.detectors.sassd import (SASSD, SASSDConfig,
                                            sassd_loss, sassd_predict)

TINY = dict(voxel_size=(3.6, 3.8, 0.5), nms_pre=64, max_num=8)


def _batch(b=1, n=256, seed=0):
    cfg = SASSDConfig(**TINY)
    rng = np.random.default_rng(seed)
    pcr = np.asarray(cfg.point_cloud_range, np.float32)
    pts = rng.random((b, n, 3)).astype(np.float32) * \
        (pcr[3:] - pcr[:3]) + pcr[:3]
    gt = np.array([[[30, 0, -1.8, 3.9, 1.6, 1.56, 0.0]]], np.float32)
    gt = np.tile(gt, (b, 1, 1))
    return cfg, dict(points=jnp.asarray(pts),
                     point_mask=jnp.ones((b, n), bool),
                     gt_boxes=jnp.asarray(gt),
                     gt_labels=jnp.zeros((b, 1), jnp.int32),
                     gt_mask=jnp.ones((b, 1), bool))


def test_forward_has_aux_branch_in_both_modes():
    """Aux params must exist in both train and eval trees (init at
    eval, then apply at train — the CLI flow); predict ignores the aux
    outputs, matching the reference's test_mode skip."""
    cfg, batch = _batch()
    model = SASSD(cfg=cfg)
    v = model.init(jax.random.PRNGKey(0), batch['points'],
                   batch['point_mask'], train=False)
    assert 'point_fc' in v['params']
    out_t, _ = model.apply(v, batch['points'], batch['point_mask'],
                           train=True, mutable=['batch_stats'])
    assert 'point_cls' in out_t and 'point_reg' in out_t
    assert out_t['point_cls'].shape == batch['points'].shape[:2]


def test_aux_targets_mark_inside_points():
    cfg, batch = _batch(n=64)
    # place half the points inside the gt box
    pts = np.array(batch['points'])
    pts[0, :32] = np.array([30, 0, -1.5]) + \
        np.random.default_rng(1).normal(0, 0.2, (32, 3)) * [0.5, 0.2, 0.1]
    batch['points'] = jnp.asarray(pts.astype(np.float32))
    model = SASSD(cfg=cfg)
    v = model.init(jax.random.PRNGKey(0), batch['points'],
                   batch['point_mask'], train=True)
    out, _ = model.apply(v, batch['points'], batch['point_mask'],
                         train=True, mutable=['batch_stats'])
    total, losses = sassd_loss(out, batch, cfg)
    assert 'loss_aux_cls' in losses and 'loss_aux_reg' in losses
    assert np.isfinite(float(total))
    assert float(losses['loss_aux_reg']) > 0   # inside points exist


def test_grads_flow_through_aux():
    cfg, batch = _batch(n=64)
    model = SASSD(cfg=cfg)
    v = model.init(jax.random.PRNGKey(0), batch['points'],
                   batch['point_mask'], train=True)

    def f(params):
        out, _ = model.apply(
            {'params': params, 'batch_stats': v['batch_stats']},
            batch['points'], batch['point_mask'], train=True,
            mutable=['batch_stats'])
        return sassd_loss(out, batch, cfg)[0]

    grads = jax.grad(f)(v['params'])
    g_aux = max(float(jnp.abs(x).max()) for x in
                jax.tree_util.tree_leaves(grads['point_fc']))
    assert np.isfinite(g_aux) and g_aux > 0


def test_predict_matches_second_shapes():
    cfg, batch = _batch()
    model = SASSD(cfg=cfg)
    v = model.init(jax.random.PRNGKey(0), batch['points'],
                   batch['point_mask'], train=False)
    out = model.apply(v, batch['points'], batch['point_mask'],
                      train=False)
    det = sassd_predict(out, cfg)
    assert det['boxes3d'].shape[-1] == 7
    assert np.isfinite(np.asarray(det['scores'])).all()


def test_config_builds():
    from dfm_tpu.models import build_detector
    from dfm_tpu.runtime.config import load_config
    cfg = load_config(os.path.join(os.path.dirname(__file__), '..',
                                   'configs', 'sassd_kitti_3class.py'))
    h = build_detector(cfg.model.to_dict())
    assert h.type == 'SASSD'
