"""SMOKE monocular 3D detector (flax / functional).

Equivalent of the reference's `SMOKEMono3D` wrapper
(mmdet3d/models/detectors/smoke_mono3d.py), `SMOKEMono3DHead`
(dense_heads/smoke_mono3d_head.py:16-530) and `SMOKECoder`
(core/bbox/coders/smoke_bbox_coder.py): DLA-34 + DLANeck features, a
CenterNet-style head (class heatmap + 8-channel regression:
depth offset, center2d offset, dim offsets (sigmoid-0.5), 2-vector
orientation), gaussian-focal heatmap loss + L1 corner loss at GT
centers, and top-k heatmap decode at inference.
"""

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.boxes import corners_cam
from ..backbones.dla import DLANet
from ..heads.center_head import gaussian_focal_loss, gaussian_radius
from ..layers import apply_norm
from ..necks.dla_neck import DLANeck


@dataclasses.dataclass(frozen=True)
class SMOKEConfig:
    """Mirrors configs/_base_/models/smoke.py hyperparameters."""
    num_classes: int = 3
    feat_channels: int = 256
    base_depth: Tuple[float, float] = (28.01, 16.32)
    base_dims: Tuple[Tuple[float, float, float], ...] = (
        (0.88, 1.73, 0.67), (1.78, 1.70, 0.58), (3.88, 1.63, 1.53))
    downsample: int = 4
    max_objs: int = 64
    topk: int = 100
    score_thr: float = 0.25
    use_dcn_neck: bool = True


class SMOKEHead(nn.Module):
    cfg: SMOKEConfig
    norm: str = 'gn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool = False):
        """feat: (B, H/4, W/4, C) -> (heatmap (B,h,w,C_cls) clamped
        sigmoid, reg (B,h,w,8) with dim/ori activations applied)."""
        cfg = self.cfg

        def branch(ch_out, name):
            x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=True, dtype=self.dtype,
                        name=f'{name}_conv')(feat)
            x = apply_norm(self, x, self.norm, 32, train, dtype=self.dtype)
            x = nn.relu(x)
            return nn.Conv(ch_out, (1, 1), use_bias=True, dtype=self.dtype,
                           name=f'{name}_out')(x)

        heatmap = jnp.clip(jax.nn.sigmoid(
            branch(cfg.num_classes, 'cls').astype(jnp.float32)),
            1e-4, 1 - 1e-4)
        reg = branch(8, 'reg').astype(jnp.float32)
        dims = jax.nn.sigmoid(reg[..., 3:6]) - 0.5
        ori = reg[..., 6:8]
        ori = ori / jnp.maximum(
            jnp.linalg.norm(ori, axis=-1, keepdims=True), 1e-6)
        reg = jnp.concatenate([reg[..., :3], dims, ori], -1)
        return heatmap, reg


class SMOKEMono3D(nn.Module):
    cfg: SMOKEConfig = dataclasses.field(default_factory=SMOKEConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        feats = DLANet(norm='bn', dtype=self.dtype,
                       name='backbone')(img.astype(self.dtype), train)
        feat = DLANeck(use_dcn=self.cfg.use_dcn_neck, norm='bn',
                       dtype=self.dtype, name='neck')(feats, train)
        hm, reg = SMOKEHead(self.cfg, norm='gn', dtype=self.dtype,
                            name='bbox_head')(feat, train)
        return dict(heatmap=hm, reg=reg)


def smoke_decode_at(reg_at, points, labels, cam2img, cfg: SMOKEConfig):
    """SMOKECoder.decode at given feature-map points.

    Args:
        reg_at: (K, 8); points: (K, 2) feature-map (x, y);
        labels: (K,); cam2img: (4, 4).

    Returns:
        (K, 7) camera-frame boxes (center at TRUE center, yaw global).
    """
    depth = reg_at[:, 0] * cfg.base_depth[1] + cfg.base_depth[0]
    c2d = (points + reg_at[:, 1:3]) * cfg.downsample   # original pixels
    from ...core.transforms import points_img2cam
    loc = points_img2cam(
        jnp.concatenate([c2d, depth[:, None]], -1), cam2img)
    base = jnp.asarray(cfg.base_dims, jnp.float32)[labels]  # (K, 3) l,h,w
    dims_lhw = jnp.exp(reg_at[:, 3:6]) * base
    # orientation: alpha from the 2-vector, yaw = alpha + ray angle
    alpha = jnp.arctan2(reg_at[:, 6], reg_at[:, 7])
    ray = jnp.arctan2(loc[:, 0], loc[:, 2])
    yaw = alpha + ray
    # box (x, y, z, dx(l), dy(h), dz(w), yaw), y at bottom:
    # locations decode to the 3D center per SMOKE; shift to bottom
    bottom = loc.at[:, 1].add(dims_lhw[:, 1] / 2)
    return jnp.concatenate(
        [bottom, dims_lhw[:, 0:1], dims_lhw[:, 1:2], dims_lhw[:, 2:3],
         yaw[:, None]], -1)


def smoke_targets(gt_boxes_cam, centers2d, gt_labels, gt_mask,
                  featmap_size, cfg: SMOKEConfig):
    """Gaussian heatmap + center indices for one image (static
    max_objs)."""
    ny, nx = featmap_size
    g = centers2d.shape[0]
    cx = centers2d[:, 0] / cfg.downsample
    cy = centers2d[:, 1] / cfg.downsample
    xi = jnp.clip(jnp.floor(cx), 0, nx - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.floor(cy), 0, ny - 1).astype(jnp.int32)
    inside = (cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
    valid = gt_mask & inside

    # radius from the projected 2D extent approximation (dims / depth)
    f = 7.2  # nominal focal / downsample scale surrogate for radius
    wl = jnp.stack([gt_boxes_cam[:, 4] * f, gt_boxes_cam[:, 3] * f], -1)
    radius = jnp.maximum(gaussian_radius(wl, 0.7), 2.0)

    gy = jnp.arange(ny, dtype=jnp.float32)[None, :, None]
    gx = jnp.arange(nx, dtype=jnp.float32)[None, None, :]
    d2 = (gx - xi[:, None, None])**2 + (gy - yi[:, None, None])**2
    sigma = ((2 * radius + 1) / 6.0)[:, None, None]
    gauss = jnp.exp(-d2 / (2 * sigma**2))
    gauss = jnp.where((d2 <= radius[:, None, None]**2) &
                      valid[:, None, None], gauss, 0.0)
    heatmap = jnp.zeros((cfg.num_classes, ny, nx))
    for c in range(cfg.num_classes):
        m = (gt_labels == c)[:, None, None]
        heatmap = heatmap.at[c].set(
            jnp.max(jnp.where(m, gauss, 0.0), axis=0))
    order = jnp.argsort(~valid)[:cfg.max_objs]
    return (heatmap.transpose(1, 2, 0), yi[order] * nx + xi[order],
            valid[order], order)


def smoke_loss(outputs, batch, cfg: SMOKEConfig, cam2img):
    """Heatmap gaussian focal + L1 corner loss at GT centers
    (reference smoke_mono3d_head.py:430-530)."""
    hm_pred, reg = outputs['heatmap'], outputs['reg']
    b, ny, nx, _ = hm_pred.shape

    def single(boxes_cam, c2d, labels, mask, reg_i, c2i):
        heatmap, inds, msk, order = smoke_targets(
            boxes_cam, c2d, labels, mask, (ny, nx), cfg)
        reg_flat = reg_i.reshape(ny * nx, 8)
        reg_at = reg_flat[inds]
        pts = jnp.stack([(inds % nx).astype(jnp.float32),
                         (inds // nx).astype(jnp.float32)], -1)
        pred_boxes = smoke_decode_at(reg_at, pts, labels[order], c2i, cfg)
        gt_sel = boxes_cam[order]
        pc = corners_cam(pred_boxes)
        gc = corners_cam(gt_sel)
        w = msk.astype(jnp.float32)[:, None, None]
        l1 = (jnp.abs(pc - gc) * w).sum() / \
            jnp.maximum(w.sum() * 24, 1.0)
        return heatmap, l1

    hms, l1s = jax.vmap(single)(
        batch['gt_boxes_cam'], batch['centers2d'], batch['gt_labels'],
        batch['gt_mask'], reg, cam2img)
    losses = dict(
        loss_cls=gaussian_focal_loss(hm_pred.astype(jnp.float32), hms),
        loss_bbox=l1s.mean() * 10.0)
    return losses


def smoke_predict(outputs, cam2img, cfg: SMOKEConfig):
    """Top-k decode for one sample (batch index 0)."""
    hm = outputs['heatmap'][0]
    reg = outputs['reg'][0]
    ny, nx, c = hm.shape
    hmax = jax.lax.reduce_window(hm, -jnp.inf, jax.lax.max, (3, 3, 1),
                                 (1, 1, 1), [(1, 1), (1, 1), (0, 0)])
    hm = jnp.where(hm >= hmax, hm, 0.0)
    scores, idx = jax.lax.top_k(hm.reshape(-1), cfg.topk)
    cls = (idx % c).astype(jnp.int32)
    pix = idx // c
    pts = jnp.stack([(pix % nx).astype(jnp.float32),
                     (pix // nx).astype(jnp.float32)], -1)
    reg_at = reg.reshape(ny * nx, 8)[pix]
    boxes = smoke_decode_at(reg_at, pts, cls, cam2img[0], cfg)
    scores = jnp.where(scores > cfg.score_thr, scores, 0.0)
    return dict(boxes_cam=boxes, scores=scores, labels=cls)
