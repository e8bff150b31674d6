"""SA-SSD: structure-aware single-stage LiDAR detector (flax).

Equivalent of the reference's `SASSD`
(mmdet3d/models/detectors/sassd.py:14-136 +
mmdet3d/models/middle_encoders/sparse_encoder.py:495-690
`SparseEncoderSASSD`): a SECOND-style voxel detector whose middle
encoder carries an auxiliary point-wise branch during training —
multi-scale voxel features are interpolated back onto the raw points,
a small FC head predicts per-point foreground probability and offset
to the assigned box's gravity center, and the two auxiliary losses
(sigmoid focal + smooth-L1 beta=1/9) regularize the backbone. The
test path is exactly the SECOND baseline (aux branch skipped).

TPU-first: instead of nearest-voxel gathers over three sparse levels,
the point-wise features come from one trilinear sample of the dense
voxel volume at each (masked, padded) point — same information flow,
static shapes, no sparse coordinate bookkeeping.
"""

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.boxes import points_in_rotated_boxes_bev
from ..heads.anchor3d_head import LIGAAnchor3DHead
from .teacher import LidarTeacher
from .voxelnet import VoxelNetConfig, voxelnet_loss, voxelnet_predict

__all__ = ['SASSDConfig', 'SASSD', 'sassd_loss', 'sassd_predict']


@dataclasses.dataclass(frozen=True)
class SASSDConfig(VoxelNetConfig):
    """SECOND settings + aux-branch weights (reference SA-SSD)."""
    aux_cls_weight: float = 1.0
    aux_reg_weight: float = 1.0


class SASSD(nn.Module):
    cfg: SASSDConfig = dataclasses.field(default_factory=SASSDConfig)
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
        out = dict(cls_score=cls_score, bbox_pred=bbox_pred,
                   dir_pred=dir_pred, volume_feat=vol, bev_feat=bev)

        # Auxiliary point-wise branch: trilinear sample of the volume
        # at point positions (reference make_auxiliary_points over 3
        # sparse levels). Always built — its params must exist in both
        # train and eval variable trees — but it is cheap (one
        # trilinear sample + two small Dense) and predict ignores it;
        # the reference skips it in test_mode (sparse_encoder.py:531).
        pcr = np.asarray(cfg.point_cloud_range, np.float32)
        vsz = np.asarray(cfg.voxel_size, np.float32)
        nzp, ny, nx = vol.shape[1:4]
        # volume voxel size in z includes the pool factor
        zs = (pcr[5] - pcr[2]) / nzp
        pos = (points - pcr[:3]) / jnp.asarray(
            [vsz[0], vsz[1], zs], jnp.float32) - 0.5   # (B, P, 3)

        def tri(vol_i, pos_i):
            # vol_i (Nz, Ny, Nx, C), pos_i (P, 3) x,y,z fractional
            fx, fy, fz = pos_i[:, 0], pos_i[:, 1], pos_i[:, 2]
            x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nx - 2)
            y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, ny - 2)
            z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0,
                          max(nzp - 2, 0))
            wx = jnp.clip(fx - x0, 0, 1)[:, None]
            wy = jnp.clip(fy - y0, 0, 1)[:, None]
            wz = jnp.clip(fz - z0, 0, 1)[:, None]
            out_f = 0
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        w = ((wz if dz else 1 - wz) *
                             (wy if dy else 1 - wy) *
                             (wx if dx else 1 - wx))
                        f = vol_i[jnp.minimum(z0 + dz, nzp - 1),
                                  y0 + dy, x0 + dx]
                        out_f = out_f + w * f
            return out_f

        pw = jax.vmap(tri)(vol.astype(jnp.float32), pos)
        pw = pw.astype(self.dtype)
        pw = nn.relu(nn.Dense(64, dtype=self.dtype,
                              name='point_fc')(pw))
        out['point_cls'] = nn.Dense(
            1, dtype=self.dtype,
            name='point_cls')(pw)[..., 0].astype(jnp.float32)
        out['point_reg'] = nn.Dense(
            3, dtype=self.dtype,
            name='point_reg')(pw).astype(jnp.float32)
        return out


def _smooth_l1(x, beta):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def sassd_loss(outputs, batch, cfg: SASSDConfig, axis_name=None):
    """SECOND anchor loss + the two auxiliary losses (reference
    SparseEncoderSASSD.aux_loss, sparse_encoder.py:636-681)."""
    total, losses = voxelnet_loss(outputs, batch, cfg,
                                  axis_name=axis_name)
    if 'point_cls' not in outputs:
        return total, losses

    pts = batch['points']
    pmask = batch.get('point_mask')
    if pmask is None:
        pmask = jnp.ones(pts.shape[:2], bool)
    gt = batch['gt_boxes'].astype(jnp.float32)
    gt_mask = batch['gt_mask']

    def single(p, pm, gt_b, gt_m):
        bev = points_in_rotated_boxes_bev(p[:, :2], gt_b)
        inz = (p[:, 2:3] >= gt_b[None, :, 2]) & \
            (p[:, 2:3] <= gt_b[None, :, 2] + gt_b[None, :, 5])
        inside = bev & inz & gt_m[None, :]             # (P, G)
        lbl = inside.any(-1) & pm
        gt_center = jnp.concatenate(
            [gt_b[:, :2], gt_b[:, 2:3] + gt_b[:, 5:6] / 2], -1)
        d2 = jnp.sum((p[:, None] - gt_center[None]) ** 2, -1)
        assign = jnp.argmin(jnp.where(inside, d2, jnp.inf), -1)
        off = jnp.where(lbl[:, None], p - gt_center[assign], 0.0)
        return lbl, off

    lbl, off_t = jax.vmap(single)(pts, pmask, gt, gt_mask)
    pos = lbl.astype(jnp.float32)
    valid = pmask.astype(jnp.float32)
    npos = jnp.maximum(pos.sum(), 1.0)

    logits = outputs['point_cls']
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * pos + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    pt = p * pos + (1 - p) * (1 - pos)
    focal = (0.25 * pos + 0.75 * (1 - pos)) * (1 - pt) ** 2 * ce
    losses['loss_aux_cls'] = (focal * valid).sum() / npos * \
        cfg.aux_cls_weight

    reg = _smooth_l1(outputs['point_reg'] - off_t, beta=1 / 9.)
    losses['loss_aux_reg'] = (reg.sum(-1) * pos).sum() / npos * \
        cfg.aux_reg_weight
    total = total + losses['loss_aux_cls'] + losses['loss_aux_reg']
    return total, losses


def sassd_predict(outputs, cfg: SASSDConfig):
    """Test path identical to the SECOND baseline (reference
    sassd.py:105-116)."""
    return voxelnet_predict(outputs, cfg)
