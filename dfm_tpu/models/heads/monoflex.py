"""MonoFlex monocular 3D head (flax).

Equivalent of the reference's inherited `MonoFlexHead`
(mmdet3d/models/dense_heads/monoflex_head.py, 771 LoC + the MonoFlex
bbox coder, core/bbox/coders/monoflex_bbox_coder.py): CenterNet-style
heatmap detection with
  * 2D box distances, 3D-center offset,
  * 10 projected keypoints (8 corners + top/bottom center),
  * per-class dimension residuals,
  * 4-bin multibin orientation (bin cls + per-bin sin/cos),
  * direct depth with predicted log-variance PLUS three geometric
    keypoint depths (corner-pair height ratios) with their own
    uncertainties, fused by inverse-uncertainty softmax — the paper's
    "flexible" depth ensemble.

Edge fusion (reference model_utils/edge_fusion_module.py:1-78 +
monoflex_head.py use_edge_fusion): features along the image boundary
get a dedicated 1D-conv stack whose output is added back onto the
class-heatmap and offset predictions at the boundary pixels —
recovering truncated objects whose centers fall off-screen. The
reference builds per-image dynamic edge-index lists and scatter-adds
in a python loop; with static feature shapes the boundary path is a
compile-time constant, so here it is a static gather → 1D convs →
static `.at[].add` (fully jit/vmap-able, no dynamic shapes).
TPU-first: static top-K decoding, no dynamic object lists.
"""

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..layers import apply_norm
from .center_head import gaussian_focal_loss, gaussian_radius

__all__ = ['MonoFlexConfig', 'MonoFlexHead', 'monoflex_loss',
           'monoflex_decode', 'multibin_loss']

BIN_CENTERS = np.array([0.0, np.pi / 2, np.pi, -np.pi / 2], np.float32)
BIN_MARGIN = np.pi / 6


@dataclasses.dataclass(frozen=True)
class MonoFlexConfig:
    num_classes: int = 3
    feat_channels: int = 256
    downsample: int = 4
    base_dims: Tuple[Tuple[float, float, float], ...] = (
        (3.88, 1.53, 1.63), (0.84, 1.76, 0.66), (1.76, 1.73, 0.60))
    # keypoint index pairs used for the three geometric depths
    # (corner columns 0-3 top/4-7 bottom, 8 top-center, 9 bottom-center)
    max_objs: int = 32
    topk: int = 100
    score_thr: float = 0.25
    # boundary-feature mixing for truncated objects (reference
    # use_edge_fusion; fuses into cls + offset, edge_fusion_inds)
    use_edge_fusion: bool = False


def edge_path(ny, nx):
    """Static boundary path (P, 2) int32 (x, y): left column top→
    bottom, bottom row left→right, right column bottom→top, top row
    right→left — the reference's get_edge_indices order
    (models/utils/edge_indices.py:55-80) at feature resolution."""
    ys = np.arange(ny, dtype=np.int64)
    xs = np.arange(nx, dtype=np.int64)
    left = np.stack([np.zeros(ny, np.int64), ys], 1)
    bottom = np.stack([xs, np.full(nx, ny - 1, np.int64)], 1)
    right = np.stack([np.full(ny, nx - 1, np.int64), ys[::-1]], 1)
    top = np.stack([xs[::-1], np.zeros(nx, np.int64)], 1)
    return np.concatenate([left, bottom, right, top]).astype(np.int32)


class EdgeFusion(nn.Module):
    """1D conv stack over the boundary sequence, scatter-added onto a
    dense prediction (reference EdgeFusionModule.forward)."""
    out_channels: int
    feat_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, branch_feat, out, train: bool = False):
        ny, nx = branch_feat.shape[1:3]
        path = edge_path(ny, nx)                       # (P, 2) static
        px, py = path[:, 0], path[:, 1]
        e = branch_feat[:, py, px, :]                  # (B, P, C)
        e = nn.Conv(self.feat_channels, (3,), padding=[(1, 1)],
                    dtype=self.dtype, name='edge_conv')(e)
        e = nn.relu(apply_norm(self, e, 'bn', 32, train,
                               dtype=self.dtype))
        e = nn.Conv(self.out_channels, (1,), dtype=self.dtype,
                    name='edge_out')(e).astype(out.dtype)
        return out.at[:, py, px, :].add(e)


class MonoFlexHead(nn.Module):
    cfg: MonoFlexConfig
    norm: str = 'gn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, train: bool = False):
        """feat (B, H/4, W/4, C) -> dict of dense predictions."""
        cfg = self.cfg

        def branch_feat(name):
            x = nn.Conv(cfg.feat_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], use_bias=True,
                        dtype=self.dtype, name=f'{name}_conv')(feat)
            x = apply_norm(self, x, self.norm, 32, train,
                           dtype=self.dtype)
            return nn.relu(x)

        def branch(ch_out, name):
            return nn.Conv(ch_out, (1, 1), use_bias=True,
                           dtype=self.dtype, name=f'{name}_out')(
                branch_feat(name)).astype(jnp.float32)

        # cls + offset get the boundary-sequence mixing when enabled
        # (reference monoflex_head.py feat_level edge fusion on the
        # cls heatmap and center-offset predictions)
        cls_feat = branch_feat('cls')
        cls_logit = nn.Conv(cfg.num_classes, (1, 1), use_bias=True,
                            dtype=self.dtype, name='cls_out')(
            cls_feat).astype(jnp.float32)
        off_feat = branch_feat('offset')
        off_pred = nn.Conv(2, (1, 1), use_bias=True, dtype=self.dtype,
                           name='offset_out')(off_feat).astype(jnp.float32)
        if cfg.use_edge_fusion:
            cls_logit = EdgeFusion(cfg.num_classes, cfg.feat_channels,
                                   dtype=self.dtype, name='edge_cls')(
                cls_feat, cls_logit, train)
            off_pred = EdgeFusion(2, cfg.feat_channels,
                                  dtype=self.dtype, name='edge_offset')(
                off_feat, off_pred, train)

        hm = jnp.clip(jax.nn.sigmoid(cls_logit), 1e-4, 1 - 1e-4)
        return dict(
            heatmap=hm,
            bbox2d=branch(4, 'bbox2d'),          # l, r, t, b distances
            offset=off_pred,                     # 3D-center sub-pixel
            kpts=branch(20, 'kpts'),             # 10 keypoint offsets
            dims=branch(3, 'dims'),              # log residuals
            ori_cls=branch(4, 'ori_cls'),        # multibin logits
            ori_off=branch(8, 'ori_off'),        # per-bin sin / cos
            depth=branch(1, 'depth'),            # inverse-sigmoid depth
            depth_unc=branch(1, 'depth_unc'),    # direct log-variance
            kpt_unc=branch(3, 'kpt_unc'),        # keypoint-depth logvar
        )


def _decode_direct_depth(x):
    """monoflex depth activation: 1/sigmoid(x) - 1 (coder
    decode_depth)."""
    return 1.0 / jax.nn.sigmoid(x) - 1.0


def multibin_loss(ori_cls, ori_off, gt_alpha, weights, avg_factor):
    """4-bin multibin orientation loss (reference loss
    `MultiBinLoss` semantics): CE over bin membership + L1 on the
    assigned bins' (sin, cos)."""
    centers = jnp.asarray(BIN_CENTERS)
    diff = gt_alpha[..., None] - centers[None, None]
    diff = (diff + np.pi) % (2 * np.pi) - np.pi
    in_bin = (jnp.abs(diff) < (np.pi / 2 + BIN_MARGIN))
    cls_tgt = in_bin.astype(jnp.float32)
    cls_loss = -(cls_tgt * jax.nn.log_sigmoid(ori_cls) +
                 (1 - cls_tgt) * jax.nn.log_sigmoid(-ori_cls))
    cls_loss = (cls_loss.mean(-1) * weights).sum() / avg_factor

    sin_t, cos_t = jnp.sin(diff), jnp.cos(diff)
    off = ori_off.reshape(ori_off.shape[:-1] + (4, 2))
    reg = jnp.abs(off[..., 0] - sin_t) + jnp.abs(off[..., 1] - cos_t)
    reg = (reg * cls_tgt).sum(-1) / jnp.maximum(cls_tgt.sum(-1), 1.0)
    reg_loss = (reg * weights).sum() / avg_factor
    return cls_loss + reg_loss


def _gather(dense, inds):
    """(B, H, W, C), (B, K) flat -> (B, K, C)."""
    b, h, w, c = dense.shape
    flat = dense.reshape(b, h * w, c)
    return jnp.take_along_axis(flat, inds[..., None], axis=1)


def monoflex_targets(gt_boxes_cam, centers2d, kpts2d, gt_labels,
                     gt_mask, featmap_size, cfg: MonoFlexConfig):
    """Per-sample dense heatmap + per-object targets.

    Args:
        gt_boxes_cam: (G, 7) camera boxes (x, y, z, l, h, w, ry),
            y at bottom; centers2d (G, 2) projected 3D centers
            (original pixels); kpts2d (G, 10, 2) projected keypoints.
    """
    ny, nx = featmap_size
    g = gt_boxes_cam.shape[0]
    c = centers2d / cfg.downsample
    xi = jnp.clip(jnp.floor(c[:, 0]), 0, nx - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.floor(c[:, 1]), 0, ny - 1).astype(jnp.int32)
    inside = ((c[:, 0] >= 0) & (c[:, 0] < nx) & (c[:, 1] >= 0) &
              (c[:, 1] < ny))
    valid = gt_mask & inside

    # class heatmaps with gaussian peaks
    wl = jnp.stack([gt_boxes_cam[:, 4], gt_boxes_cam[:, 3]], -1) * 8
    radius = jnp.maximum(gaussian_radius(wl, 0.7), 2.0)
    gy = jnp.arange(ny, dtype=jnp.float32)[None, :, None]
    gx = jnp.arange(nx, dtype=jnp.float32)[None, None, :]
    d2 = (gx - xi[:, None, None])**2 + (gy - yi[:, None, None])**2
    sigma = ((2 * radius + 1) / 6.0)[:, None, None]
    gauss = jnp.where((d2 <= radius[:, None, None]**2) &
                      valid[:, None, None],
                      jnp.exp(-d2 / (2 * sigma**2)), 0.0)
    heatmap = jnp.zeros((cfg.num_classes, ny, nx))
    for cls in range(cfg.num_classes):
        m = (gt_labels == cls)[:, None, None]
        heatmap = heatmap.at[cls].set(
            jnp.max(jnp.where(m, gauss, 0.0), axis=0))
    heatmap = heatmap.transpose(1, 2, 0)

    inds = yi * nx + xi
    offset_tgt = c - jnp.stack([xi, yi], -1).astype(jnp.float32)
    kpt_tgt = (kpts2d / cfg.downsample -
               jnp.stack([xi, yi], -1)[:, None, :].astype(jnp.float32))
    return dict(heatmap=heatmap, inds=inds, mask=valid,
                offset=offset_tgt, kpts=kpt_tgt.reshape(g, 20))


def monoflex_loss(outs, batch, cfg: MonoFlexConfig, cam2img):
    """Total loss (reference MonoFlexHead.loss structure).

    batch: gt_boxes_cam (B,G,7), centers2d (B,G,2), kpts2d (B,G,10,2),
        gt_labels (B,G), gt_mask (B,G), gt_alphas (B,G).
    """
    ny, nx = outs['heatmap'].shape[1:3]
    tg = jax.vmap(lambda b, c2, kp, l, m: monoflex_targets(
        b, c2, kp, l, m, (ny, nx), cfg))(
        batch['gt_boxes_cam'], batch['centers2d'], batch['kpts2d'],
        batch['gt_labels'], batch['gt_mask'])

    losses = {}
    losses['loss_heatmap'] = gaussian_focal_loss(outs['heatmap'],
                                                 tg['heatmap'])
    w = tg['mask'].astype(jnp.float32)
    num = jnp.maximum(w.sum(), 1.0)

    def at(key):
        return _gather(outs[key], tg['inds'])

    losses['loss_offset'] = (jnp.abs(at('offset') - tg['offset'])
                             .sum(-1) * w).sum() / num
    losses['loss_kpts'] = (jnp.abs(at('kpts') - tg['kpts'])
                           .mean(-1) * w).sum() / num

    base = jnp.asarray(cfg.base_dims, jnp.float32)[
        jnp.clip(batch['gt_labels'], 0, cfg.num_classes - 1)]
    dims_tgt = jnp.log(jnp.maximum(
        batch['gt_boxes_cam'][..., 3:6], 1e-3) / base)
    losses['loss_dims'] = (jnp.abs(at('dims') - dims_tgt).sum(-1)
                           * w).sum() / num

    losses['loss_ori'] = multibin_loss(at('ori_cls'), at('ori_off'),
                                       batch['gt_alphas'], w, num)

    # direct depth with predicted uncertainty: |d - d*|/sigma + log s
    depth_pred = _decode_direct_depth(at('depth')[..., 0])
    logvar = at('depth_unc')[..., 0]
    depth_tgt = batch['gt_boxes_cam'][..., 2]
    dl = jnp.abs(depth_pred - depth_tgt) * jnp.exp(-logvar) + logvar
    losses['loss_depth'] = (dl * w).sum() / num
    return losses


def monoflex_decode(outs, cam2img, cfg: MonoFlexConfig):
    """Static top-K decode for ONE sample (batch via vmap).

    Returns boxes_3d (K, 7) camera frame (bottom-center), scores,
    labels.
    """
    hm = outs['heatmap'][0] if outs['heatmap'].ndim == 4 else \
        outs['heatmap']
    ny, nx, ncls = hm.shape
    hmax = jax.lax.reduce_window(hm, -jnp.inf, jax.lax.max, (3, 3, 1),
                                 (1, 1, 1), [(1, 1), (1, 1), (0, 0)])
    peaks = jnp.where(hm >= hmax, hm, 0.0).reshape(-1)
    scores, idx = jax.lax.top_k(peaks, cfg.topk)
    labels = (idx % ncls).astype(jnp.int32)
    pix = idx // ncls
    xi = (pix % nx).astype(jnp.float32)
    yi = (pix // nx).astype(jnp.float32)

    def at(key, ch):
        return outs[key].reshape(-1, ny * nx, ch)[0][pix] \
            if outs[key].ndim == 4 else \
            outs[key].reshape(ny * nx, ch)[pix]

    offset = at('offset', 2)
    c2d = (jnp.stack([xi, yi], -1) + offset) * cfg.downsample
    d_direct = _decode_direct_depth(at('depth', 1)[:, 0])

    # geometric keypoint depths: f * H3D / pixel-height of 3 corner
    # pairs (center pair + two diagonal pairs), following the coder
    kpts = at('kpts', 20).reshape(-1, 10, 2) * cfg.downsample
    base = jnp.asarray(cfg.base_dims, jnp.float32)[labels]
    h3d = jnp.exp(at('dims', 3)[:, 1]) * base[:, 1]
    f = cam2img[1, 1]
    ph_center = jnp.maximum(kpts[:, 9, 1] - kpts[:, 8, 1], 0.1)
    ph_d1 = jnp.maximum(((kpts[:, 4, 1] + kpts[:, 6, 1]) -
                         (kpts[:, 0, 1] + kpts[:, 2, 1])) / 2, 0.1)
    ph_d2 = jnp.maximum(((kpts[:, 5, 1] + kpts[:, 7, 1]) -
                         (kpts[:, 1, 1] + kpts[:, 3, 1])) / 2, 0.1)
    d_kpts = jnp.stack([f * h3d / ph_center, f * h3d / ph_d1,
                        f * h3d / ph_d2], -1)

    # inverse-uncertainty softmax fusion over [direct, kpt x3]
    unc = jnp.concatenate([at('depth_unc', 1), at('kpt_unc', 3)], -1)
    wgt = jax.nn.softmax(-unc, axis=-1)
    depth = (jnp.concatenate([d_direct[:, None], d_kpts], -1) *
             wgt).sum(-1)
    depth = jnp.clip(depth, 0.1, 200.0)

    from ...core.transforms import points_img2cam
    loc = points_img2cam(
        jnp.concatenate([c2d, depth[:, None]], -1), cam2img)
    dims = jnp.exp(at('dims', 3)) * base                 # (K, 3) l,h,w

    ori_cls = at('ori_cls', 4)
    ori_off = at('ori_off', 8).reshape(-1, 4, 2)
    bin_id = jnp.argmax(ori_cls, -1)
    so = jnp.take_along_axis(ori_off, bin_id[:, None, None].repeat(
        2, -1), 1)[:, 0]
    local = jnp.arctan2(so[:, 0], so[:, 1])
    alpha = jnp.asarray(BIN_CENTERS)[bin_id] + local
    yaw = alpha + jnp.arctan2(loc[:, 0], loc[:, 2])
    yaw = (yaw + np.pi) % (2 * np.pi) - np.pi

    bottom = loc.at[:, 1].add(dims[:, 1] / 2)
    boxes = jnp.concatenate([bottom, dims, yaw[:, None]], -1)
    scores = jnp.where(scores > cfg.score_thr, scores, 0.0)
    return dict(boxes_3d=boxes, scores_3d=scores, labels_3d=labels)
