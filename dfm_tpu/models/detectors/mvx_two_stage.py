"""MVX multi-modal voxel detector (LiDAR + camera PointFusion).

Equivalent of the reference's `MVXTwoStageDetector` /
`MVXFasterRCNN` / `DynamicMVXFasterRCNN`
(mmdet3d/models/detectors/mvx_two_stage.py:1-500, mvx_faster_rcnn.py)
with the `PointFusion` layer (fusion_layers/point_fusion.py:14-230):
an image backbone+FPN extracts 2D features, every LiDAR point is
projected through lidar2img and bilinearly samples image features,
an MLP fuses [point feature || image feature] into the per-point
feature that the voxel encoder consumes, and the standard voxel
pipeline (scatter VFE -> dense encoder -> BEV -> Anchor3DHead)
detects on the fused cloud.

TPU-first: points are fixed-size padded, the fusion is one batched
bilinear gather (ops/grid_sample.py), and hard/dynamic voxelization is
the static scatter-mean shared with the SECOND family (teacher.py).
"""

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.grid_sample import bilinear_sample
from ..backbones.resnet import ResNet
from ..heads.anchor3d_head import (LIGAAnchor3DHead,
                                   anchor3d_head_get_bboxes,
                                   anchor3d_head_loss)
from ..necks.fpn import FPN
from .teacher import LidarTeacher
from .voxelnet import VoxelNetConfig

__all__ = ['MVXFasterRCNN', 'MVXConfig', 'mvx_loss', 'mvx_predict',
           'point_fusion_sample']


@dataclasses.dataclass(frozen=True)
class MVXConfig(VoxelNetConfig):
    img_backbone_depth: int = 18
    img_channels: int = 64            # FPN out channels
    fusion_mid: int = 64              # PointFusion mid/out width
    max_points_per_voxel: Any = 5


def point_fusion_sample(img_feat, points, lidar2img, img_shape):
    """Project points and sample image features (reference
    point_fusion.py:point_sample — aug-free eval form; train-time
    flips/scales are undone upstream by the pipeline metas).

    Args:
        img_feat: (Hf, Wf, C) one FPN level.
        points: (P, 3).
        lidar2img: (4, 4).
        img_shape: (H, W) full-resolution image size.

    Returns:
        (P, C) samples (0 outside the frustum), (P,) validity.
    """
    h, w = img_shape
    hf, wf = img_feat.shape[:2]
    homo = jnp.concatenate([points, jnp.ones_like(points[:, :1])], -1)
    proj = homo @ jnp.asarray(lidar2img, jnp.float32).T
    z = proj[:, 2]
    uv = proj[:, :2] / jnp.maximum(z[:, None], 1e-5)
    valid = (z > 1e-3) & (uv[:, 0] >= 0) & (uv[:, 0] < w) & \
        (uv[:, 1] >= 0) & (uv[:, 1] < h)
    # full-res pixel -> feature-map coordinate
    coords = jnp.stack([uv[:, 0] * (wf / w), uv[:, 1] * (hf / h)], -1)
    out = bilinear_sample(img_feat, coords)
    return out * valid[:, None], valid


class MVXFasterRCNN(nn.Module):
    cfg: MVXConfig = dataclasses.field(default_factory=MVXConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, point_mask, img, lidar2img,
                 train: bool = False):
        """points (B, P, 3), point_mask (B, P), img (B, H, W, 3),
        lidar2img (B, 4, 4)."""
        cfg = self.cfg
        feats = ResNet(depth=cfg.img_backbone_depth, norm='bn',
                       dtype=self.dtype, name='img_backbone')(
                           img.astype(self.dtype), train)
        fpn = FPN(out_channels=cfg.img_channels, dtype=self.dtype,
                  name='img_neck')(feats, train)
        lvl0 = fpn[0]                               # finest level

        img_shape = img.shape[1:3]
        sampled, valid = jax.vmap(
            lambda f, p, m: point_fusion_sample(f, p, m, img_shape)
        )(lvl0.astype(jnp.float32), points[..., :3], lidar2img)

        # PointFusion MLP: [xyz || img feature] -> per-point feature
        x = jnp.concatenate([points, sampled.astype(self.dtype)], -1)
        x = nn.relu(nn.Dense(cfg.fusion_mid, dtype=self.dtype,
                             name='fuse0')(x))
        fused = nn.relu(nn.Dense(cfg.fusion_mid, dtype=self.dtype,
                                 name='fuse1')(x))
        pts_aug = jnp.concatenate([points[..., :3], fused], -1)

        vol, bev = LidarTeacher(
            point_cloud_range=cfg.point_cloud_range,
            voxel_size=cfg.voxel_size,
            volume_channels=cfg.cv_channels,
            bev_channels=cfg.bev_channels,
            max_points=cfg.max_points_per_voxel,
            dtype=self.dtype, name='pts_encoder')(
                pts_aug, point_mask, train)
        cls_score, bbox_pred, dir_pred = LIGAAnchor3DHead(
            num_classes=cfg.num_classes, feat_channels=cfg.bev_channels,
            num_anchors=len(cfg.anchor_sizes) * len(cfg.anchor_rotations),
            norm='gn', dtype=self.dtype, name='bbox_head')(bev, train)
        return dict(cls_score=cls_score, bbox_pred=bbox_pred,
                    dir_pred=dir_pred, bev_feat=bev,
                    fusion_valid=valid)


def mvx_loss(outputs, batch, cfg: MVXConfig, axis_name=None):
    from .dfm import _anchors_per_class
    ny, nx = outputs['cls_score'].shape[1:3]
    per_class, _ = _anchors_per_class(cfg, (ny, nx))
    losses = anchor3d_head_loss(
        (outputs['cls_score'], outputs['bbox_pred'], outputs['dir_pred']),
        per_class, batch['gt_boxes'], batch['gt_labels'],
        batch['gt_mask'], list(cfg.assigner_cfgs),
        num_classes=cfg.num_classes, dir_offset=cfg.dir_offset,
        normalizer_clamp_value=cfg.normalizer_clamp_value,
        axis_name=axis_name)
    return sum(losses.values()), losses


def mvx_predict(outputs, cfg: MVXConfig):
    from .dfm import _anchors_per_class
    ny, nx = outputs['cls_score'].shape[1:3]
    _, flat = _anchors_per_class(cfg, (ny, nx))
    return anchor3d_head_get_bboxes(
        (outputs['cls_score'], outputs['bbox_pred'], outputs['dir_pred']),
        flat, num_classes=cfg.num_classes, dir_offset=cfg.dir_offset,
        score_thr=cfg.score_thr, nms_thr=cfg.nms_thr,
        nms_pre=cfg.nms_pre, max_num=cfg.max_num)
