"""MultiViewDfM (MV-FCOS3D++): multi-view multi-frame 4D detector (flax).

Equivalent of the reference's `MultiViewDfM`
(mmdet3d/models/detectors/multiview_dfm.py:14-353), Waymo camsync
config: per-view ResNet+FPN features (previous frames under
stop_gradient, :95-97), a 3D anchor-grid of sample points projected
into every view/frame (`point_sample`, fusion_layers/point_fusion.py:14),
masked view-sum / frame-mean aggregation (:177-205), reshape to a voxel
volume, `OutdoorImVoxelNeck` to BEV, and an Anchor3DHead.

TPU-first: views/frames are leading axes of one tensor; sampling uses
the tap-packed gathers; all masks are static.
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
class MVDfMConfig:
    """Hyperparameters mirroring configs/dfm/multiview-dfm_r101_dcn_2x16_
    waymoD5-3d-3class_camsync.py (reduced-size defaults for tests)."""
    num_classes: int = 3
    num_views: int = 5
    num_frames: int = 1                 # 1 = camsync config; >1 = sweeps
    frame_fusion: str = 'mean'          # 'mean' | 'concat'
    feat_channels: int = 64             # FPN channels (ref: 64)
    voxel_range: Tuple[float, ...] = (-35.0, -75.0, -2, 75.0, 75.0, 4)
    voxel_grid: Tuple[int, int, int] = (12, 240, 300)   # (Nz, Ny, Nx)
    backbone_depth: int = 101
    # neck_3d selection: 'imvoxel' (camsync config) or 'dfm' (10-sweeps
    # config, requires frame_fusion='concat'; reference dfm_neck.py)
    neck_3d: str = 'imvoxel'
    # 3D head: 'anchor' (Anchor3DHead, shipped configs) or 'center'
    # (CenterHead branch, reference multiview_dfm.py:280-285,332-336)
    bbox_head: str = 'anchor'
    center_tasks: Tuple[Tuple[int, ...], ...] = ((0,), (1, 2))
    # optional stereo path (reference multiview_dfm.py:210-256): a 3D
    # backbone over the volume + voxel_sample frustum re-projection
    # feeding a dense depth head. Off in both shipped configs
    # (camsync.py:26-27 sets depth_head=None, backbone_3d=None).
    with_backbone_3d: bool = False
    with_depth_head: bool = False
    num_backbone_3d_blocks: int = 2
    depth_min: float = 2.0
    depth_max: float = 70.0
    depth_num_bins: int = 128
    depth_downsample: int = 4
    anchor_ranges: Tuple[Tuple[float, ...], ...] = (
        (-35.0, -75.0, -0.0345, 75.0, 75.0, -0.0345),
        (-35.0, -75.0, 0.0, 75.0, 75.0, 0.0),
        (-35.0, -75.0, -0.1188, 75.0, 75.0, -0.1188))
    anchor_sizes: Tuple[Tuple[float, ...], ...] = (
        (4.73, 2.08, 1.77), (0.91, 0.84, 1.74), (1.81, 0.84, 1.77))
    anchor_rotations: Tuple[float, ...] = (0.0, 1.57)
    dir_offset: float = 0.7854
    assigner_cfgs: Tuple[dict, ...] = (
        dict(pos_iou_thr=0.55, neg_iou_thr=0.4, min_pos_iou=0.4),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.3),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.3))
    nms_pre: int = 1024
    score_thr: float = 0.1
    nms_thr: float = 0.25
    max_num: int = 500

    def sample_points(self):
        """(Nz, Ny, Nx, 3) sample-grid centers via the aligned anchor
        generator (reference multiview_dfm.py:119-123 uses
        AlignedAnchor3DRangeGenerator.grid_anchors as the grid)."""
        gen = AlignedAnchor3DRangeGenerator(
            ranges=[list(self.voxel_range)], sizes=[[1, 1, 1]],
            rotations=[0.0])
        nz, ny, nx = self.voxel_grid
        a = gen.anchors_single_range(self.voxel_grid, self.voxel_range,
                                     [1, 1, 1])
        return a[:, :, :, 0, 0, :3]

    def anchor_generator(self):
        from ...core.anchors import Anchor3DRangeGenerator
        return Anchor3DRangeGenerator(
            ranges=list(self.anchor_ranges), sizes=list(self.anchor_sizes),
            rotations=list(self.anchor_rotations))


class MultiViewDfM(nn.Module):
    cfg: MVDfMConfig = dataclasses.field(default_factory=MVDfMConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, imgs, lidar2img, img_shape, train: bool = False):
        """Args:
            imgs: (B, F, V, H, W, 3) normalized multi-frame multi-view
                images (F frames, first = current).
            lidar2img: (B, F, V, 4, 4) lidar->image projections (prev
                frames already rewritten by ego-motion, reference
                loading.py:122-142).
            img_shape: (H, W) valid image extent for masking.

        Returns:
            dict with head outputs + 'bev_feat' + 'volume_feat'.
        """
        cfg = self.cfg
        b, f, v, h, w, _ = imgs.shape

        backbone = ResNet(depth=cfg.backbone_depth, norm='bn',
                          dtype=self.dtype, name='backbone')
        fpn = FPN(out_channels=cfg.feat_channels, num_outs=4, start_level=0,
                  dtype=self.dtype, name='neck')

        flat = imgs.reshape(b * f * v, h, w, 3).astype(self.dtype)
        feats = fpn(backbone(flat, train), train)
        feat0 = feats[0]                      # stride-4 level (ref :104)
        fh, fw, fc = feat0.shape[1:]
        feat0 = feat0.reshape(b, f, v, fh, fw, fc)
        # previous frames: no gradients (reference multiview_dfm.py:95-97)
        if f > 1:
            feat0 = jnp.concatenate(
                [feat0[:, :1], jax.lax.stop_gradient(feat0[:, 1:])], axis=1)

        pts = jnp.asarray(self.cfg.sample_points())     # (Nz, Ny, Nx, 3)
        nz, ny, nx = pts.shape[:3]
        pts_flat = pts.reshape(-1, 3)

        def sample_one(feat_vw, l2i_vw):
            """One (frame, view): feat (fh, fw, C), l2i (4, 4)."""
            uvw = transform_points(pts_flat, l2i_vw)
            # perspective divide with depth validity
            depth = uvw[:, 2]
            uv = uvw[:, :2] / jnp.maximum(jnp.abs(depth), 1e-5)[:, None]
            valid = ((depth > 0) & (uv[:, 0] >= 0) & (uv[:, 0] < w) &
                     (uv[:, 1] >= 0) & (uv[:, 1] < h))
            # feature-map coords (stride 4, align-corners index space)
            coords = jnp.stack([uv[:, 0] / (w - 1) * (fw - 1),
                                uv[:, 1] / (h - 1) * (fh - 1)], axis=-1)
            out = packed_bilinear_sample(pack_taps_2d(feat_vw), coords, fc)
            return out * valid[:, None].astype(out.dtype), valid

        def sample_batch(feat_b, l2i_b):
            # feat_b (F, V, fh, fw, C); l2i_b (F, V, 4, 4)
            samp, valid = jax.vmap(jax.vmap(sample_one))(feat_b, l2i_b)
            # masked view aggregation: sum / count (reference :177-205)
            vf = valid.astype(samp.dtype)[..., None]
            view_sum = (samp * vf).sum(axis=1)
            view_cnt = vf.sum(axis=1)
            frame_feats = view_sum / jnp.maximum(view_cnt, 1.0)  # (F, P, C)
            if cfg.frame_fusion == 'mean' or f == 1:
                agg = frame_feats.mean(axis=0)
            else:
                agg = frame_feats.transpose(1, 0, 2).reshape(
                    frame_feats.shape[1], -1)
            return agg

        vol = jax.vmap(sample_batch)(feat0, lidar2img)  # (B, P, C')
        vol = vol.reshape(b, nz, ny, nx, -1)

        out = {}
        if cfg.with_backbone_3d:
            # volume 3D backbone (reference multiview_dfm.py:210-217;
            # residual blocks keeping the grid resolution)
            from ..necks.imvoxel_neck import ResModule3D
            vb = vol
            for i in range(cfg.num_backbone_3d_blocks):
                vb = ResModule3D(vb.shape[-1], 'bn', self.dtype,
                                 name=f'backbone_3d_block{i}')(vb, train)
            vol = vb

        if cfg.with_depth_head:
            # voxel_sample stereo re-projection per (batch, view)
            # (reference :220-256, transform_depth=False path) + a depth
            # cost module predicting a per-view depth distribution
            from ...ops.frustum import voxel_sample
            depth_samples = np.linspace(
                cfg.depth_min, cfg.depth_max, cfg.depth_num_bins,
                dtype=np.float32)
            vr = np.asarray(cfg.voxel_range, np.float32)
            vs = (vr[3:] - vr[:3]) / np.asarray(
                cfg.voxel_grid[::-1], np.float32)

            def frustum_one(vol_b, l2i_bv):
                return voxel_sample(
                    vol_b, jnp.asarray(depth_samples), l2i_bv,
                    cfg.depth_downsample, (h, w),
                    voxel_range=vr, voxel_size=vs)

            stereo = jax.vmap(
                lambda vol_b, l2i_b: jax.vmap(
                    lambda m: frustum_one(vol_b, m))(l2i_b))(
                    vol, lidar2img[:, 0])      # (B, V, D', H', W', C)
            from ..backbones.dfm_backbone import DepthPredModule
            sb, sv = stereo.shape[:2]
            stereo_flat = stereo.reshape((sb * sv,) + stereo.shape[2:])
            depth_cost = DepthPredModule(
                stereo_flat.shape[-1], 'gn', self.dtype,
                name='depth_pred')(stereo_flat, train)[..., 0]
            out['stereo_feat'] = stereo_flat
            out['depth_cost'] = depth_cost     # (B*V, D', H', W')

        if cfg.neck_3d == 'dfm':
            from ..necks.dfm_neck import DfMNeck
            assert cfg.frame_fusion == 'concat' and f == cfg.num_frames
            bev = DfMNeck(in_channels=cfg.feat_channels, out_channels=256,
                          num_frames=f, norm='bn', dtype=self.dtype,
                          name='neck_3d')(vol, train)
        else:
            bev = OutdoorImVoxelNeck(in_channels=vol.shape[-1],
                                     out_channels=256, norm='bn',
                                     dtype=self.dtype,
                                     name='neck_3d')(vol, train)
        if cfg.bbox_head == 'center':
            from ..heads.center_head import CenterHead, CenterHeadConfig
            ch_cfg = CenterHeadConfig(
                tasks=tuple(tuple(str(c) for c in t)
                            for t in cfg.center_tasks),
                voxel_size=((cfg.voxel_range[3] - cfg.voxel_range[0]) / nx,
                            (cfg.voxel_range[4] - cfg.voxel_range[1]) / ny),
                pc_range=(cfg.voxel_range[0], cfg.voxel_range[1]))
            task_outs = CenterHead(cfg=ch_cfg, norm='bn', dtype=self.dtype,
                                   name='bbox_head_3d')(bev, train)
            out.update(task_outs=task_outs, bev_feat=bev, volume_feat=vol)
            return out
        head = LIGAAnchor3DHead(
            num_classes=cfg.num_classes, feat_channels=256, num_convs=0,
            num_anchors=len(cfg.anchor_sizes) * len(cfg.anchor_rotations),
            norm='none', dtype=self.dtype, name='bbox_head_3d')
        cls_score, bbox_pred, dir_pred = head(bev, train)
        out.update(cls_score=cls_score, bbox_pred=bbox_pred,
                   dir_pred=dir_pred, bev_feat=bev, volume_feat=vol)
        return out


def _mv_anchors(cfg: MVDfMConfig, featmap_size):
    gen = cfg.anchor_generator()
    grid = gen.grid_anchors(featmap_size)
    per_class = [
        jnp.asarray(grid[0, :, :, c].reshape(-1, 7))
        for c in range(len(cfg.anchor_sizes))
    ]
    return per_class, jnp.asarray(grid.reshape(-1, 7))


def _center_cfg(cfg: MVDfMConfig, ny, nx):
    from ..heads.center_head import CenterHeadConfig
    return CenterHeadConfig(
        tasks=tuple(tuple(str(c) for c in t) for t in cfg.center_tasks),
        voxel_size=((cfg.voxel_range[3] - cfg.voxel_range[0]) / nx,
                    (cfg.voxel_range[4] - cfg.voxel_range[1]) / ny),
        pc_range=(cfg.voxel_range[0], cfg.voxel_range[1]))


def mvdfm_loss(outputs, batch, cfg: MVDfMConfig, rng=None, axis_name=None):
    if 'task_outs' in outputs:
        from ..heads.center_head import center_head_loss
        ny, nx = outputs['bev_feat'].shape[1:3]
        losses = center_head_loss(
            outputs['task_outs'], batch, _center_cfg(cfg, ny, nx),
            cfg.center_tasks)
        return sum(losses.values()), losses
    ny, nx = outputs['cls_score'].shape[1:3]
    per_class, _ = _mv_anchors(cfg, (ny, nx))
    losses = anchor3d_head_loss(
        (outputs['cls_score'], outputs['bbox_pred'], outputs['dir_pred']),
        per_class, batch['gt_boxes'], batch['gt_labels'], batch['gt_mask'],
        list(cfg.assigner_cfgs), num_classes=cfg.num_classes,
        dir_offset=cfg.dir_offset, use_iou_loss=False,
        loss_weights=(1.0, 2.0, 0.2, 0.0), axis_name=axis_name)
    if 'depth_cost' in outputs and 'depth_img' in batch and rng is not None:
        # dense per-view depth loss on the voxel_sample stereo path
        # (reference multiview_dfm.py:299-306)
        from ..heads.depth_head import depth_distribution_loss
        cost = outputs['depth_cost']           # (B*V, D', H', W')
        depth_img = batch['depth_img']
        fg = batch.get('depth_fgmask_img')
        bv = cost.shape[0]
        depth_img = depth_img.reshape((bv,) + depth_img.shape[-2:])
        if fg is not None:
            fg = fg.reshape((bv,) + fg.shape[-2:])
        else:
            fg = jnp.ones(depth_img.shape, jnp.int32)
        samples = np.linspace(cfg.depth_min, cfg.depth_max,
                              cfg.depth_num_bins, dtype=np.float32)
        losses['loss_dense_depth'] = depth_distribution_loss(
            cost, depth_img, fg, jnp.asarray(samples), rng,
            dict(type='ce', loss_weight=1.0),
            up_factor=cfg.depth_downsample,
            num_sample_pixels=2048, depth_min=cfg.depth_min,
            depth_max=cfg.depth_max)
    return sum(losses.values()), losses


def mvdfm_predict(outputs, cfg: MVDfMConfig):
    if 'task_outs' in outputs:
        from ..heads.center_head import center_head_decode
        ny, nx = outputs['bev_feat'].shape[1:3]
        return center_head_decode(outputs['task_outs'],
                                  _center_cfg(cfg, ny, nx),
                                  cfg.center_tasks)
    ny, nx = outputs['cls_score'].shape[1:3]
    _, flat = _mv_anchors(cfg, (ny, nx))
    return anchor3d_head_get_bboxes(
        (outputs['cls_score'], outputs['bbox_pred'], outputs['dir_pred']),
        flat, num_classes=cfg.num_classes, dir_offset=cfg.dir_offset,
        score_thr=cfg.score_thr, nms_thr=cfg.nms_thr, nms_pre=cfg.nms_pre,
        max_num=cfg.max_num)
