"""ImVoxelNet: single-view voxel-lifting 3D detector (flax).

Equivalent of the reference's `ImVoxelNet`
(mmdet3d/models/detectors/imvoxelnet.py:11-138, config
configs/imvoxelnet/imvoxelnet_4x8_kitti-3d-car.py): ResNet+FPN image
features, an aligned anchor-grid of sample points projected into the
image (`point_sample`), OutdoorImVoxelNeck to BEV and an Anchor3DHead.

TPU-first: the projection + bilinear sampling is one tap-packed gather
batch; everything is static-shape and jit-compiled end to end.
"""

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import AlignedAnchor3DRangeGenerator
from ...core.transforms import transform_points
from ...ops.packed_sample import pack_taps_2d, packed_bilinear_sample
from ..backbones.resnet import ResNet
from ..heads.anchor3d_head import (LIGAAnchor3DHead, anchor3d_head_get_bboxes,
                                   anchor3d_head_loss)
from ..necks.fpn import FPN
from ..necks.imvoxel_neck import OutdoorImVoxelNeck


@dataclasses.dataclass(frozen=True)
class ImVoxelNetConfig:
    """Mirrors configs/imvoxelnet/imvoxelnet_4x8_kitti-3d-car.py
    (reduced defaults for tests; KITTI-car: n_voxels (216, 248, 12),
    range (-0.16, -39.68, -3.08, 68.96, 39.68, 0.76))."""
    num_classes: int = 1
    feat_channels: int = 64
    voxel_range: Tuple[float, ...] = (-0.16, -39.68, -3.08,
                                      68.96, 39.68, 0.76)
    voxel_grid: Tuple[int, int, int] = (12, 248, 216)    # (Nz, Ny, Nx)
    backbone_depth: int = 50
    anchor_ranges: Tuple[Tuple[float, ...], ...] = (
        (-0.16, -39.68, -1.78, 68.96, 39.68, -1.78),)
    anchor_sizes: Tuple[Tuple[float, ...], ...] = ((3.9, 1.6, 1.56),)
    anchor_rotations: Tuple[float, ...] = (0.0, 1.57)
    dir_offset: float = 0.7854
    assigner_cfgs: Tuple[dict, ...] = (
        dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45),)
    nms_pre: int = 1024
    score_thr: float = 0.1
    nms_thr: float = 0.25
    max_num: int = 100

    def sample_points(self):
        gen = AlignedAnchor3DRangeGenerator(
            ranges=[list(self.voxel_range)], sizes=[[1, 1, 1]],
            rotations=[0.0])
        a = gen.anchors_single_range(self.voxel_grid, self.voxel_range,
                                     [1, 1, 1])
        return a[:, :, :, 0, 0, :3]                       # (Nz, Ny, Nx, 3)

    def anchor_generator(self):
        from ...core.anchors import Anchor3DRangeGenerator
        return Anchor3DRangeGenerator(
            ranges=list(self.anchor_ranges), sizes=list(self.anchor_sizes),
            rotations=list(self.anchor_rotations))


class ImVoxelNet(nn.Module):
    cfg: ImVoxelNetConfig = dataclasses.field(
        default_factory=ImVoxelNetConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, imgs, lidar2img, img_shape, train: bool = False):
        """Args:
            imgs: (B, H, W, 3); lidar2img: (B, 4, 4);
            img_shape: (H, W) valid extent for masking.
        """
        cfg = self.cfg
        b, h, w, _ = imgs.shape
        backbone = ResNet(depth=cfg.backbone_depth, norm='bn',
                          dtype=self.dtype, name='backbone')
        fpn = FPN(out_channels=cfg.feat_channels, num_outs=4, start_level=0,
                  dtype=self.dtype, name='neck')
        feats = fpn(backbone(imgs.astype(self.dtype), train), train)
        feat0 = feats[0]                                  # stride 4
        fh, fw, fc = feat0.shape[1:]

        pts = jnp.asarray(cfg.sample_points())
        nz, ny, nx = pts.shape[:3]
        pts_flat = pts.reshape(-1, 3)

        def sample_one(feat_i, l2i):
            uvw = transform_points(pts_flat, l2i)
            depth = uvw[:, 2]
            uv = uvw[:, :2] / jnp.maximum(jnp.abs(depth), 1e-5)[:, None]
            valid = ((depth > 0) & (uv[:, 0] >= 0) & (uv[:, 0] < w) &
                     (uv[:, 1] >= 0) & (uv[:, 1] < h))
            coords = jnp.stack([uv[:, 0] / (w - 1) * (fw - 1),
                                uv[:, 1] / (h - 1) * (fh - 1)], axis=-1)
            out = packed_bilinear_sample(pack_taps_2d(feat_i), coords, fc)
            return out * valid[:, None].astype(out.dtype)

        vol = jax.vmap(sample_one)(feat0, lidar2img)
        vol = vol.reshape(b, nz, ny, nx, fc)

        bev = OutdoorImVoxelNeck(in_channels=fc, out_channels=256,
                                 norm='bn', dtype=self.dtype,
                                 name='neck_3d')(vol, train)
        head = LIGAAnchor3DHead(
            num_classes=cfg.num_classes, feat_channels=256, num_convs=0,
            num_anchors=len(cfg.anchor_sizes) * len(cfg.anchor_rotations),
            norm='none', dtype=self.dtype, name='bbox_head')
        cls_score, bbox_pred, dir_pred = head(bev, train)
        return dict(cls_score=cls_score, bbox_pred=bbox_pred,
                    dir_pred=dir_pred, bev_feat=bev, volume_feat=vol)


def _anchors(cfg: ImVoxelNetConfig, featmap_size):
    gen = cfg.anchor_generator()
    grid = gen.grid_anchors(featmap_size)
    per_class = [jnp.asarray(grid[0, :, :, c].reshape(-1, 7))
                 for c in range(len(cfg.anchor_sizes))]
    return per_class, jnp.asarray(grid.reshape(-1, 7))


def imvoxelnet_loss(outputs, batch, cfg: ImVoxelNetConfig, axis_name=None):
    ny, nx = outputs['cls_score'].shape[1:3]
    per_class, _ = _anchors(cfg, (ny, nx))
    losses = anchor3d_head_loss(
        (outputs['cls_score'], outputs['bbox_pred'], outputs['dir_pred']),
        per_class, batch['gt_boxes'], batch['gt_labels'], batch['gt_mask'],
        list(cfg.assigner_cfgs), num_classes=cfg.num_classes,
        dir_offset=cfg.dir_offset, use_iou_loss=False,
        loss_weights=(1.0, 2.0, 0.2, 0.0), axis_name=axis_name)
    return sum(losses.values()), losses


def imvoxelnet_predict(outputs, cfg: ImVoxelNetConfig):
    ny, nx = outputs['cls_score'].shape[1:3]
    _, flat = _anchors(cfg, (ny, nx))
    return anchor3d_head_get_bboxes(
        (outputs['cls_score'], outputs['bbox_pred'], outputs['dir_pred']),
        flat, num_classes=cfg.num_classes, dir_offset=cfg.dir_offset,
        score_thr=cfg.score_thr, nms_thr=cfg.nms_thr, nms_pre=cfg.nms_pre,
        max_num=cfg.max_num)
