"""VoxelNet-style LiDAR detector (flax composite).

Equivalent of the reference's `VoxelNet`
(mmdet3d/models/detectors/voxelnet.py: Voxelization -> HardSimpleVFE ->
middle encoder -> BEV backbone -> Anchor3DHead), the SECOND-family
baseline that also serves as DfM's LiDAR teacher
(configs/dfm/second_teacher.py). Reuses the TPU-native voxelization +
dense encoder + BEV hourglass from `teacher.py` and the LIGA anchor
head/loss/NMS machinery.
"""

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..heads.anchor3d_head import (LIGAAnchor3DHead, anchor3d_head_get_bboxes,
                                   anchor3d_head_loss)
from .dfm import DfMConfig
from .teacher import LidarTeacher


@dataclasses.dataclass(frozen=True)
class VoxelNetConfig(DfMConfig):
    """Anchor/assigner/test settings are inherited from DfMConfig
    (same KITTI 3-class setup). `max_points_per_voxel` selects hard
    voxelization (SECOND: 5); None = dynamic (DynamicVoxelNet)."""
    max_points_per_voxel: Any = None


class VoxelNet(nn.Module):
    cfg: VoxelNetConfig = dataclasses.field(default_factory=VoxelNetConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        cfg = self.cfg
        vol, bev = LidarTeacher(
            point_cloud_range=cfg.point_cloud_range,
            voxel_size=cfg.voxel_size,
            volume_channels=cfg.cv_channels,
            bev_channels=cfg.bev_channels,
            max_points=cfg.max_points_per_voxel,
            dtype=self.dtype, name='encoder')(points, point_mask, train)
        head = LIGAAnchor3DHead(
            num_classes=cfg.num_classes, feat_channels=cfg.bev_channels,
            num_anchors=len(cfg.anchor_sizes) * len(cfg.anchor_rotations),
            norm='gn', dtype=self.dtype, name='bbox_head')(bev, train)
        cls_score, bbox_pred, dir_pred = head
        return dict(cls_score=cls_score, bbox_pred=bbox_pred,
                    dir_pred=dir_pred, volume_feat=vol, bev_feat=bev)


def voxelnet_loss(outputs, batch, cfg: VoxelNetConfig, axis_name=None):
    from .dfm import _anchors_per_class
    ny, nx = outputs['cls_score'].shape[1:3]
    per_class, _ = _anchors_per_class(cfg, (ny, nx))
    losses = anchor3d_head_loss(
        (outputs['cls_score'], outputs['bbox_pred'], outputs['dir_pred']),
        per_class, batch['gt_boxes'], batch['gt_labels'], batch['gt_mask'],
        list(cfg.assigner_cfgs), num_classes=cfg.num_classes,
        dir_offset=cfg.dir_offset,
        normalizer_clamp_value=cfg.normalizer_clamp_value,
        axis_name=axis_name)
    return sum(losses.values()), losses


def voxelnet_predict(outputs, cfg: VoxelNetConfig):
    from .dfm import _anchors_per_class
    ny, nx = outputs['cls_score'].shape[1:3]
    _, flat = _anchors_per_class(cfg, (ny, nx))
    return anchor3d_head_get_bboxes(
        (outputs['cls_score'], outputs['bbox_pred'], outputs['dir_pred']),
        flat, num_classes=cfg.num_classes, dir_offset=cfg.dir_offset,
        score_thr=cfg.score_thr, nms_thr=cfg.nms_thr, nms_pre=cfg.nms_pre,
        max_num=cfg.max_num)
