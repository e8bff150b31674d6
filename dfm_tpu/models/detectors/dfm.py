"""DfM: Monocular 3D Object Detection with Depth from Motion (flax).

TPU-native rebuild of the reference detector
(mmdet3d/models/detectors/dfm.py:18-540):

  imgs (cur+prev) -> shared LIGAResNet -> SPP-UNet neck
  -> plane-sweep cost volume + 3D hourglass (DfMBackbone)
  -> depth distribution head
  -> frustum-to-voxel lifting (+ sem features, softmax attention)
  -> height compression -> BEV hourglass -> LIGA anchor head.

Differences by design (all TPU-motivated):
  * one jitted program, fully batched (the reference asserts bs == 1 in
    the stereo path);
  * augmentation metadata (flip/crop/scale, per-sample intrinsics,
    cur2prev) are traced arrays in a `BatchMeta` pytree instead of
    python dict metas — a single compiled program serves every sample;
  * depth-volume upsampling is implicit (see dfm_tpu.ops.frustum);
  * losses are static-shape (padded GT + masks, sampled depth pixels).

Auxiliary 2D head (LIGAATSSHead) and the LiDAR-teacher imitation are
separate training-time components (see dfm_tpu.models.detectors.
imitation / heads.atss2d when present).
"""

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import Anchor3DRangeGenerator
from ..backbones.bev_hourglass import BEVHourglass
from ..backbones.dfm_backbone import DfMBackbone
from ..backbones.liga_resnet import LIGAResNet
from ..heads.anchor3d_head import (LIGAAnchor3DHead, anchor3d_head_get_bboxes,
                                   anchor3d_head_loss)
from ..heads.depth_head import depth_distribution_loss
from ..necks.frustum_to_voxel import FrustumToVoxel
from ..necks.spp_unet import SPPUNetNeck


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BatchMeta:
    """Per-sample geometry/augmentation state (all traced arrays).

    Replaces the reference's `img_metas` dict list: ori_cam2img for the
    cost volume, (augmented) cam2img for voxel projection, cur2prev
    ego-motion, and the flip/crop/scale augmentation trail
    (reference dfm_backbone.py:145-173, transforms_3d.py Resize3D /
    RandomCrop3D / RandomFlip3D bookkeeping).
    """
    ori_cam2img: jnp.ndarray      # (B, 4, 4)
    cam2img: jnp.ndarray          # (B, 4, 4) after aug
    cur2prev: jnp.ndarray         # (B, 4, 4)
    org_w: jnp.ndarray            # (B,)
    flip: jnp.ndarray             # (B,) {0, 1}
    crop_offset: jnp.ndarray      # (B, 2)
    scale_factor: jnp.ndarray     # (B,)

    @staticmethod
    def identity(batch_size, cam2img=None):
        eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (batch_size, 1, 1))
        c = eye if cam2img is None else jnp.asarray(cam2img)
        return BatchMeta(
            ori_cam2img=c, cam2img=c, cur2prev=eye,
            org_w=jnp.full((batch_size,), 1242.0),
            flip=jnp.zeros((batch_size,)),
            crop_offset=jnp.zeros((batch_size, 2)),
            scale_factor=jnp.ones((batch_size,)))


@dataclasses.dataclass(frozen=True)
class DfMConfig:
    """Static model hyperparameters (KITTI defaults from the reference
    config configs/dfm/dfm_r34_1x8_kitti-3d-3class.py)."""
    num_classes: int = 3
    depth_num_bins: int = 288
    depth_min: float = 2.0
    depth_max: float = 59.6
    depth_downsample: int = 4
    downsampled_depth_offset: float = 0.5
    point_cloud_range: Tuple[float, ...] = (2, -30.4, -3, 59.6, 30.4, 1)
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 0.2)
    cost_sample_factor: int = 4
    cv_channels: int = 32
    sem_channels: Tuple[int, int] = (128, 32)
    stereo_channels: Tuple[int, int] = (32, 32)
    bev_channels: int = 64
    backbone_depth: int = 34
    anchor_ranges: Tuple[Tuple[float, ...], ...] = (
        (2, -30.4, -1.78, 59.6, 30.4, -1.78),
        (2, -30.4, -0.6, 59.6, 30.4, -0.6),
        (2, -30.4, -0.6, 59.6, 30.4, -0.6))
    anchor_sizes: Tuple[Tuple[float, ...], ...] = (
        (3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73))
    anchor_rotations: Tuple[float, ...] = (0.0, 1.5707963)
    dir_offset: float = 0.7854
    # train
    assigner_cfgs: Tuple[dict, ...] = (
        dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35))
    normalizer_clamp_value: float = 10.0
    # cross-replica (pmean) averaging of loss normalizers; False =
    # local normalization (reference *_wodistnorm.py config)
    dist_norm: bool = True
    depth_loss: Any = dataclasses.field(default_factory=lambda: dict(
        type='balanced_focal', loss_weight=1.0, fg_weight=5, bg_weight=1,
        alpha=1, gamma=2))
    num_depth_sample_pixels: int = 8192
    # test
    nms_pre: int = 1024
    score_thr: float = 0.1
    nms_thr: float = 0.25
    max_num: int = 100

    @property
    def num_downsampled_bins(self):
        return self.depth_num_bins // self.depth_downsample

    def downsampled_depths(self):
        """Downsampled depth-bin centers (reference dfm.py:152-168)."""
        interval = (self.depth_max - self.depth_min) / self.depth_num_bins
        i = np.arange(self.num_downsampled_bins, dtype=np.float32)
        return ((i + self.downsampled_depth_offset) * self.depth_downsample
                * interval + self.depth_min)

    def depth_samples(self):
        """Full-resolution depth-bin centers (reference dfm.py:169-172)."""
        interval = (self.depth_max - self.depth_min) / self.depth_num_bins
        i = np.arange(self.depth_num_bins, dtype=np.float32)
        return (i + 0.5) * interval + self.depth_min

    def voxel_grid_size(self):
        pcr = np.asarray(self.point_cloud_range, np.float32)
        gs = np.round((pcr[3:] - pcr[:3]) /
                      np.asarray(self.voxel_size)).astype(int)
        return int(gs[2]), int(gs[1]), int(gs[0])  # Nz, Ny, Nx

    def coordinates_3d(self):
        """(Nz, Ny, Nx, 3) pseudo-lidar voxel centers
        (reference dfm.py:174-211)."""
        nz, ny, nx = self.voxel_grid_size()
        pcr = self.point_cloud_range
        vs = self.voxel_size
        zs = np.linspace(pcr[2] + vs[2] / 2, pcr[5] - vs[2] / 2, nz,
                         dtype=np.float32)
        ys = np.linspace(pcr[1] + vs[1] / 2, pcr[4] - vs[1] / 2, ny,
                         dtype=np.float32)
        xs = np.linspace(pcr[0] + vs[0] / 2, pcr[3] - vs[0] / 2, nx,
                         dtype=np.float32)
        zz, yy, xx = np.meshgrid(zs, ys, xs, indexing='ij')
        return np.stack([xx, yy, zz], axis=-1)

    def anchor_generator(self):
        return Anchor3DRangeGenerator(
            ranges=list(self.anchor_ranges),
            sizes=list(self.anchor_sizes),
            rotations=list(self.anchor_rotations))


class DfM(nn.Module):
    """Flax module: geometry-conditioned forward producing head outputs
    and intermediate volumes. Loss/inference post-processing live in
    `dfm_loss` / `dfm_predict` (pure functions over the outputs)."""
    cfg: DfMConfig = dataclasses.field(default_factory=DfMConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, meta: BatchMeta, train: bool = False,
                 prev_stereo_cache=None):
        """Args:
            img: (B, 2, H, W, 3) current + previous frames (normalized).
            meta: BatchMeta.
            prev_stereo_cache: optional (B, H, W, Cs) cached stereo
                features of the previous frame (video streaming: the
                previous step's 'stereo_cache' output — the prev-frame
                trunk is skipped entirely; exact when the previous
                frame was processed at the same scale/flip, which eval
                pipelines guarantee via matched augs).

        Returns:
            dict with 'cls_score', 'bbox_pred', 'dir_pred' (head outputs),
            'depth_cost' (B, D', H/4, W/4), 'bev_feat', 'volume_feat',
            'sem_feat', 'stereo_cache' (cur stereo features — feed as
            prev_stereo_cache on the next frame).
        """
        cfg = self.cfg
        b, n, h, w, _ = img.shape
        assert n == 2, 'DfM-KITTI uses one reference frame'
        pad_shape = (h, w)

        backbone = LIGAResNet(depth=cfg.backbone_depth, norm='bn',
                              dtype=self.dtype, name='backbone')
        neck = SPPUNetNeck(sem_channels=cfg.sem_channels,
                           stereo_channels=cfg.stereo_channels,
                           norm='gn', dtype=self.dtype, name='neck')

        cur = img[:, 0].astype(self.dtype)
        cur_feats = [cur] + list(backbone(cur, train))
        cur_stereo, cur_sem = neck(cur_feats, train)
        if prev_stereo_cache is not None:
            prev_stereo = prev_stereo_cache.astype(self.dtype)
        else:
            prev = img[:, 1].astype(self.dtype)
            prev_feats = [prev] + list(backbone(prev, train))
            prev_stereo, _ = neck(prev_feats, train)

        depths = jnp.asarray(cfg.downsampled_depths())
        stereo_backbone = DfMBackbone(
            in_channels=cfg.stereo_channels[1],
            cv_channels=cfg.cv_channels,
            cost_sample_factor=cfg.cost_sample_factor,
            num_depth_bins_out=cfg.num_downsampled_bins,
            norm='gn', dtype=self.dtype, name='backbone_stereo')
        mono_stereo_cost, stereo_feats, _ = stereo_backbone(
            cur_stereo, prev_stereo, depths, meta.ori_cam2img, meta.cur2prev,
            org_w=meta.org_w, flip=meta.flip, crop_offset=meta.crop_offset,
            scale_factor=meta.scale_factor, train=train)
        depth_cost = mono_stereo_cost[..., 0]  # (B, D', H/4, W/4)

        frustum = FrustumToVoxel(
            out_channels=cfg.cv_channels, depth_min=cfg.depth_min,
            depth_max=cfg.depth_max, up_factor=cfg.depth_downsample,
            norm='gn', dtype=self.dtype, name='feature_transformation')
        # kept as a static np array: FrustumToVoxel's separable fast
        # path derives the per-x-slab depth grouping at trace time
        coors_3d = cfg.coordinates_3d()
        volume_feat = frustum(stereo_feats, depth_cost, cur_sem, coors_3d,
                              meta.cam2img, pad_shape, train)

        # height compression: (B, Nz', Ny, Nx, C) -> (B, Ny, Nx, Nz'*C)
        bb, nz, ny, nx, c = volume_feat.shape
        bev = volume_feat.transpose(0, 2, 3, 1, 4).reshape(bb, ny, nx,
                                                           nz * c)
        bev_backbone = BEVHourglass(out_channels=cfg.bev_channels, norm='gn',
                                    dtype=self.dtype, name='backbone_3d')
        _, bev_feat = bev_backbone(bev, train)

        head = LIGAAnchor3DHead(
            num_classes=cfg.num_classes, feat_channels=cfg.bev_channels,
            num_anchors=len(cfg.anchor_sizes) * len(cfg.anchor_rotations),
            norm='gn', dtype=self.dtype, name='bbox_head_3d')
        cls_score, bbox_pred, dir_pred = head(bev_feat, train)

        return dict(cls_score=cls_score, bbox_pred=bbox_pred,
                    dir_pred=dir_pred, depth_cost=depth_cost,
                    volume_feat=volume_feat, bev_feat=bev_feat,
                    sem_feat=cur_sem, stereo_cache=cur_stereo)


def _anchors_per_class(cfg: DfMConfig, featmap_size):
    gen = cfg.anchor_generator()
    grid = gen.grid_anchors(featmap_size)  # (1, Ny, Nx, S, R, 7)
    per_class = [
        jnp.asarray(grid[0, :, :, c].reshape(-1, 7))
        for c in range(len(cfg.anchor_sizes))
    ]
    flat = jnp.asarray(grid.reshape(-1, 7))
    return per_class, flat


def dfm_loss(outputs, batch, cfg: DfMConfig, rng, axis_name=None):
    """Total training loss.

    Args:
        outputs: DfM.__call__ outputs.
        batch: dict with 'gt_boxes' (B, G, 7) pseudo-lidar frame,
            'gt_labels' (B, G), 'gt_mask' (B, G), optional 'depth_img'
            (B, H, W), 'depth_fgmask_img'.
        rng: PRNGKey (depth-pixel subsampling).

    Returns:
        (total, dict of scalars).
    """
    if not cfg.dist_norm:
        axis_name = None    # local normalizers (wodistnorm config)
    ny, nx = outputs['cls_score'].shape[1:3]
    anchors_per_class, _ = _anchors_per_class(cfg, (ny, nx))
    losses = anchor3d_head_loss(
        (outputs['cls_score'], outputs['bbox_pred'], outputs['dir_pred']),
        anchors_per_class, batch['gt_boxes'], batch['gt_labels'],
        batch['gt_mask'], list(cfg.assigner_cfgs),
        num_classes=cfg.num_classes, dir_offset=cfg.dir_offset,
        normalizer_clamp_value=cfg.normalizer_clamp_value,
        axis_name=axis_name)

    if 'depth_img' in batch and batch['depth_img'] is not None:
        fine_depths = jnp.asarray(cfg.depth_samples())
        losses['loss_dense_depth'] = depth_distribution_loss(
            outputs['depth_cost'], batch['depth_img'],
            batch.get('depth_fgmask_img'), fine_depths, rng,
            cfg.depth_loss, up_factor=cfg.depth_downsample,
            num_sample_pixels=cfg.num_depth_sample_pixels,
            depth_min=cfg.depth_min, depth_max=cfg.depth_max)

    total = sum(losses.values())
    return total, losses


def dfm_predict(outputs, cfg: DfMConfig):
    """Decode + NMS; returns padded detections (pseudo-lidar frame) with
    'pseudo_lidar' tag semantics handled by the result converter."""
    ny, nx = outputs['cls_score'].shape[1:3]
    _, flat_anchors = _anchors_per_class(cfg, (ny, nx))
    return anchor3d_head_get_bboxes(
        (outputs['cls_score'], outputs['bbox_pred'], outputs['dir_pred']),
        flat_anchors, num_classes=cfg.num_classes, dir_offset=cfg.dir_offset,
        score_thr=cfg.score_thr, nms_thr=cfg.nms_thr, nms_pre=cfg.nms_pre,
        max_num=cfg.max_num)
