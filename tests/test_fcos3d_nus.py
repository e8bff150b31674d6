"""FCOS3D nuScenes extensions: attribute branch + velocity code.

(heads/fcos_mono3d.py pred_attrs/pred_velo, reference
AnchorFreeMono3DHead attr/velo branches.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from dfm_tpu.models.heads.fcos_mono3d import (FCOS3DConfig,
                                              FCOSMono3DHead,
                                              fcos3d_get_bboxes,
                                              fcos3d_loss, level_points)


def _setup():
    cfg = FCOS3DConfig(num_classes=4, in_channels=8, feat_channels=8,
                       stacked_convs=1, strides=(8, 16),
                       regress_ranges=((-1, 64), (64, 1e8)),
                       max_gt=4, pred_attrs=True, num_attrs=5,
                       attr_branch_channels=8, pred_velo=True,
                       nms_pre=64, max_num=8)
    feats = [jnp.zeros((1, 16, 24, 8)), jnp.zeros((1, 8, 12, 8))]
    head = FCOSMono3DHead(cfg=cfg)
    v = head.init(jax.random.PRNGKey(0), feats)
    return cfg, head, v, feats


def test_nus_head_outputs():
    cfg, head, v, feats = _setup()
    outs = head.apply(v, feats)
    assert outs[0]['bbox_pred'].shape[-1] == 9      # + velocity
    assert outs[0]['attr_pred'].shape[-1] == 5


def test_nus_loss_and_decode():
    cfg, head, v, feats = _setup()
    outs = head.apply(v, feats)
    img_hw = (128, 192)
    pts = [level_points(((128 + s - 1) // s, (192 + s - 1) // s), s)
           for s in cfg.strides]
    batch = dict(
        gt_bboxes2d=jnp.asarray([[[20, 20, 80, 90],
                                  [100, 30, 150, 100],
                                  [0, 0, 0, 0], [0, 0, 0, 0]]],
                                jnp.float32),
        centers2d=jnp.asarray([[[50, 55], [125, 65], [0, 0], [0, 0]]],
                              jnp.float32),
        gt_depths=jnp.asarray([[10.0, 20.0, 0, 0]]),
        gt_boxes_cam=jnp.zeros((1, 4, 7)).at[0, 0].set(
            jnp.asarray([1., 1., 10., 4., 1.5, 1.8, 0.3])),
        gt_labels=jnp.asarray([[1, 2, 0, 0]]),
        gt_mask=jnp.asarray([[True, True, False, False]]),
        gt_velocities=jnp.asarray([[[1.0, 0.5], [0.0, -1.0],
                                    [0, 0], [0, 0]]], jnp.float32),
        gt_attr_labels=jnp.asarray([[2, 4, 0, 0]]),
    )
    losses = fcos3d_loss(outs, pts, cfg, batch)
    assert 'loss_velo' in losses and 'loss_attr' in losses
    for k, val in losses.items():
        assert jnp.isfinite(val), k

    cam2img = jnp.eye(4)[None].at[0, 0, 0].set(100.).at[0, 1, 1].set(
        100.).at[0, 0, 2].set(96.).at[0, 1, 2].set(64.)
    det = fcos3d_get_bboxes(outs, pts, cam2img, cfg)
    assert det['boxes3d'].shape == (1, 8, 7)
    assert det['velocity'].shape == (1, 8, 2)
    assert det['attrs'].shape == (1, 8)
    assert jnp.isfinite(det['boxes3d']).all()
