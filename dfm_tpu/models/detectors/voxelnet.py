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
    voxelization (SECOND: 5); None = dynamic (DynamicVoxelNet).

    `bbox_head` selects the dense head family the registry builds
    (reference models/builder.py:16 type-name dispatch):
      * 'anchor3d' — LIGAAnchor3DHead + MaxIoU assignment (SECOND).
      * 'shape_aware' — SSN-style ShapeAwareHead; `tasks` gives the
        per-shape-group branches (dense_heads/shape_aware_head.py).
      * 'free_anchor' — Anchor3DHead tower trained with the FreeAnchor
        bag likelihood (dense_heads/free_anchor3d_head.py:49-285).
    """
    max_points_per_voxel: Any = None
    bbox_head: str = 'anchor3d'
    tasks: Tuple[Any, ...] = ()
    pre_anchor_topk: int = 50
    free_anchor_bbox_thr: float = 0.6


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
        if cfg.bbox_head == 'shape_aware':
            from ..heads.shape_aware import ShapeAwareHead
            cls_score, bbox_pred, dir_pred, _ = ShapeAwareHead(
                tasks=[dict(t) for t in cfg.tasks],
                num_classes=cfg.num_classes, dtype=self.dtype,
                name='bbox_head')(bev, train)
        else:   # 'anchor3d' tower, shared by the free_anchor loss
            cls_score, bbox_pred, dir_pred = LIGAAnchor3DHead(
                num_classes=cfg.num_classes,
                feat_channels=cfg.bev_channels,
                num_anchors=len(cfg.anchor_sizes) *
                len(cfg.anchor_rotations),
                norm='gn', dtype=self.dtype, name='bbox_head')(bev, train)
        return dict(cls_score=cls_score, bbox_pred=bbox_pred,
                    dir_pred=dir_pred, volume_feat=vol, bev_feat=bev)


def _task_of_class(cfg):
    """class index -> its task dict (tasks list classes in order)."""
    out = []
    for t in cfg.tasks:
        out.extend([t] * int(t['num_class']))
    return out


def _shape_aware_anchors(cfg: VoxelNetConfig, bev_hw):
    """Per-class flat anchors in ShapeAwareHead's anchor-major
    (rotation, y, x) layout, each at its task's strided featmap size
    (reference shape_aware_head.py:379-428 get_anchors)."""
    import numpy as np
    gen = cfg.anchor_generator()
    grids = {}
    per_class, flat_blocks = [], []
    ci = 0
    for t in cfg.tasks:
        stride = 1
        for s in t['shared_conv_strides']:
            stride *= int(s)
        hw = (bev_hw[0] // stride, bev_hw[1] // stride)
        if hw not in grids:
            grids[hw] = gen.grid_anchors(hw)    # (1, Ny, Nx, S, R, 7)
        grid = grids[hw]
        for _ in range(int(t['num_class'])):
            a = np.asarray(grid[0, :, :, ci])   # (Ny, Nx, R, 7)
            a = np.transpose(a, (2, 0, 1, 3)).reshape(-1, 7)
            per_class.append(jnp.asarray(a))
            flat_blocks.append(a)
            ci += 1
    flat = jnp.asarray(np.concatenate(flat_blocks, axis=0))
    return per_class, flat


def voxelnet_loss(outputs, batch, cfg: VoxelNetConfig, axis_name=None):
    from .dfm import _anchors_per_class
    preds = (outputs['cls_score'], outputs['bbox_pred'],
             outputs['dir_pred'])
    if cfg.bbox_head == 'shape_aware':
        from ..heads.shape_aware import shape_aware_loss
        bev_hw = outputs['bev_feat'].shape[1:3]
        per_class, _ = _shape_aware_anchors(cfg, bev_hw)
        losses = shape_aware_loss(
            preds, per_class, batch['gt_boxes'], batch['gt_labels'],
            batch['gt_mask'], list(cfg.assigner_cfgs),
            num_classes=cfg.num_classes, dir_offset=cfg.dir_offset,
            axis_name=axis_name)
        return sum(losses.values()), losses
    ny, nx = outputs['cls_score'].shape[1:3]
    per_class, flat = _anchors_per_class(cfg, (ny, nx))
    if cfg.bbox_head == 'free_anchor':
        from ..heads.free_anchor3d import free_anchor3d_loss
        losses = free_anchor3d_loss(
            preds, flat, batch['gt_boxes'], batch['gt_labels'],
            batch['gt_mask'], num_classes=cfg.num_classes,
            pre_anchor_topk=cfg.pre_anchor_topk,
            bbox_thr=cfg.free_anchor_bbox_thr, dir_offset=cfg.dir_offset)
        return sum(losses.values()), losses
    losses = anchor3d_head_loss(
        preds, per_class, batch['gt_boxes'], batch['gt_labels'],
        batch['gt_mask'], list(cfg.assigner_cfgs),
        num_classes=cfg.num_classes, dir_offset=cfg.dir_offset,
        normalizer_clamp_value=cfg.normalizer_clamp_value,
        axis_name=axis_name)
    return sum(losses.values()), losses


def voxelnet_predict(outputs, cfg: VoxelNetConfig):
    from .dfm import _anchors_per_class
    preds = (outputs['cls_score'], outputs['bbox_pred'],
             outputs['dir_pred'])
    if cfg.bbox_head == 'shape_aware':
        from ..heads.shape_aware import shape_aware_get_bboxes
        bev_hw = outputs['bev_feat'].shape[1:3]
        _, flat = _shape_aware_anchors(cfg, bev_hw)
        return shape_aware_get_bboxes(
            preds, flat, num_classes=cfg.num_classes,
            dir_offset=cfg.dir_offset, score_thr=cfg.score_thr,
            nms_thr=cfg.nms_thr, nms_pre=cfg.nms_pre,
            max_num=cfg.max_num)
    ny, nx = outputs['cls_score'].shape[1:3]
    _, flat = _anchors_per_class(cfg, (ny, nx))
    return anchor3d_head_get_bboxes(
        preds, flat, num_classes=cfg.num_classes, dir_offset=cfg.dir_offset,
        score_thr=cfg.score_thr, nms_thr=cfg.nms_thr, nms_pre=cfg.nms_pre,
        max_num=cfg.max_num)
