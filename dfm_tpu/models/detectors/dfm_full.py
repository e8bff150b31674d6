"""DfM full training composite: 3D head + 2D auxiliary ATSS head +
dense depth + LiDAR-teacher imitation.

Mirrors the reference's complete `DfM.forward_train`
(mmdet3d/models/detectors/dfm.py:300-371):
  losses = bbox_head_3d.loss(...)                  # anchor 3D losses
         + bbox_head_2d (FPN on sem_feat, ATSS w/ 3D centers, :330-347)
         + depth_head.loss (balanced_focal, :348-357)
         + imitation (teacher feature pairs, :358-370)

`DfMFull` wires every submodule; `dfm_full_loss` sums all terms. Any
part degrades gracefully when its batch inputs are absent (no points ->
no imitation; no 2D boxes -> no aux loss), matching the reference's
conditional branches.
"""

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..heads.atss2d import ATSS2DConfig, ATSS2DHead, atss2d_loss
from ..necks.fpn import FPN
from .dfm import BatchMeta, DfM, DfMConfig, dfm_loss
from .dfm_with_teacher import bev_cell_centers
from .imitation import ImitationAdapter, imitation_loss
from .teacher import LidarTeacher


class DfMFull(nn.Module):
    cfg: DfMConfig = dataclasses.field(default_factory=DfMConfig)
    atss_cfg: ATSS2DConfig = dataclasses.field(
        default_factory=lambda: ATSS2DConfig(feat_channels=64))
    with_teacher: bool = True
    with_2d_head: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, meta: BatchMeta, points=None, point_mask=None,
                 train: bool = False):
        cfg = self.cfg
        outputs = DfM(cfg=cfg, dtype=self.dtype, name='dfm')(
            img, meta, train)

        if self.with_2d_head:
            # FPN over the stride-4 semantic features -> ATSS aux head
            # (reference neck_2d: FPN(in=[sem], num_outs=5, on_output)
            fpn = FPN(out_channels=self.atss_cfg.in_channels, num_outs=5,
                      start_level=0, dtype=self.dtype,
                      name='neck_2d')([outputs['sem_feat']], train)
            outputs['outs_2d'] = ATSS2DHead(
                cfg=self.atss_cfg, dtype=self.dtype,
                name='bbox_head_2d')(fpn, train)

        if self.with_teacher and points is not None:
            t_vol, t_bev = LidarTeacher(
                point_cloud_range=cfg.point_cloud_range,
                voxel_size=cfg.voxel_size,
                volume_channels=cfg.cv_channels,
                bev_channels=cfg.bev_channels,
                dtype=self.dtype, name='lidar_teacher')(
                    points, point_mask, train)
            outputs['imitation'] = dict(
                bev_pred=ImitationAdapter(cfg.bev_channels, self.dtype,
                                          name='imit_bev')(
                    outputs['bev_feat']),
                bev_target=jax.lax.stop_gradient(t_bev),
                volume_pred=ImitationAdapter(cfg.cv_channels, self.dtype,
                                             name='imit_vol')(
                    outputs['volume_feat']),
                volume_target=jax.lax.stop_gradient(t_vol))
        return outputs


def dfm_full_loss(outputs, batch, cfg: DfMConfig, atss_cfg: ATSS2DConfig,
                  img_hw, rng, imitation_weight=1.0, axis_name=None):
    """All training terms of the reference's forward_train.

    batch may additionally carry 'gt_bboxes2d' (B, G, 4) and 'centers2d'
    (B, G, 2) for the 2D aux loss (reference appends projected 3D
    centers to the 2D gt, dfm.py:330-336 — `centers2d` here IS that).
    """
    total, losses = dfm_loss(outputs, batch, cfg, rng, axis_name=axis_name)

    if 'outs_2d' in outputs and 'gt_bboxes2d' in batch:
        l2d = atss2d_loss(outputs['outs_2d'], img_hw,
                          dict(gt_bboxes2d=batch['gt_bboxes2d'],
                               centers2d=batch['centers2d'],
                               gt_labels=batch['gt_labels'],
                               gt_mask=batch['gt_mask']),
                          atss_cfg, axis_name=axis_name)
        losses.update(l2d)
        total = total + sum(l2d.values())

    if 'imitation' in outputs:
        im = outputs['imitation']
        centers = jnp.asarray(bev_cell_centers(cfg))
        l_bev = imitation_loss(
            im['bev_pred'], im['bev_target'], centers,
            batch['gt_boxes'], batch['gt_mask'],
            normalizer_clamp_value=cfg.normalizer_clamp_value,
            axis_name=axis_name)
        l_vol = imitation_loss(
            im['volume_pred'], im['volume_target'], centers,
            batch['gt_boxes'], batch['gt_mask'],
            normalizer_clamp_value=cfg.normalizer_clamp_value,
            axis_name=axis_name)
        losses['loss_imitation'] = imitation_weight * (l_bev + l_vol)
        total = total + losses['loss_imitation']
    return total, losses
