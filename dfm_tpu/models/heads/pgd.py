"""PGD (Probabilistic and Geometric Depth) monocular head (flax).

Equivalent of the reference's `PGDHead` core
(mmdet3d/models/dense_heads/pgd_head.py) on top of the FCOS3D head:

* a depth-classification branch over `num_depth_cls` uniform bins whose
  softmax expectation gives a probabilistic depth
  (PGDBBoxCoder.decode_prob_depth, core/bbox/coders/pgd_bbox_coder.py:73);
* a learnable sigmoid gate `fuse_lambda` fusing direct and probabilistic
  depth (pgd_head.py:363-369);
* a log-variance uncertainty branch weighting the depth loss
  (UncertainSmoothL1Loss, models/losses/uncertain_smooth_l1_loss.py).

The keypoint branch and 2D-3D consistency terms of the full PGD are
documented follow-ups (they refine the same decode path).
"""

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import losses as L
from .fcos_mono3d import FCOS3DConfig, FCOSMono3DHead, fcos3d_loss


@dataclasses.dataclass(frozen=True)
class PGDConfig(FCOS3DConfig):
    use_depth_classifier: bool = True
    depth_range: Tuple[float, float] = (0.0, 70.0)
    depth_unit: float = 10.0
    depth_branch: Tuple[int, ...] = (64,)
    weight_dim: int = 1                 # log-variance channels
    uncertainty_alpha: float = 1.0
    # keypoint branch: 8 projected 3D-corner offsets (reference
    # pgd_head.py:74,113-127) and 2D box branch + projected-box
    # consistency (pgd_head.py:735-751)
    pred_keypoints: bool = True
    pred_bbox2d: bool = True
    kpts_loss_weight: float = 1.0
    bbox2d_loss_weight: float = 1.0
    consistency_loss_weight: float = 1.0

    @property
    def num_depth_cls(self):
        return int((self.depth_range[1] - self.depth_range[0]) /
                   self.depth_unit) + 1


def decode_prob_depth(depth_cls_preds, cfg: PGDConfig):
    """Softmax expectation over uniform depth bins
    (PGDBBoxCoder.decode_prob_depth, 'uniform' division)."""
    mult = cfg.depth_unit * jnp.arange(cfg.num_depth_cls, dtype=jnp.float32)
    prob = jax.nn.softmax(depth_cls_preds.astype(jnp.float32), axis=-1)
    return (prob * mult).sum(axis=-1)


class PGDHead(nn.Module):
    """FCOS3D head + PGD depth-classifier / uncertainty branches.

    Per level adds 'depth_cls_pred' (..., num_depth_cls) and
    'weight' (..., weight_dim) to the output dicts, and replaces the
    decoded depth with the lambda-fused estimate."""
    cfg: PGDConfig = dataclasses.field(default_factory=PGDConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cfg = self.cfg
        from ..layers import ConvNorm
        outs = FCOSMono3DHead(cfg=cfg, dtype=self.dtype,
                              name='fcos3d')(feats, train)
        if not cfg.use_depth_classifier:
            return outs
        branch = [
            ConvNorm(ch, (3, 3), norm='gn', dtype=self.dtype,
                     name=f'depth_cls_prev{i}')
            for i, ch in enumerate(cfg.depth_branch)
        ]
        conv_depth_cls = nn.Conv(cfg.num_depth_cls, (1, 1),
                                 dtype=self.dtype, name='conv_depth_cls')
        weight_convs = [
            nn.Conv(1, (1, 1), dtype=self.dtype, name=f'conv_weight{i}')
            for i in range(cfg.weight_dim)
        ]
        fuse_lambda = self.param('fuse_lambda',
                                 lambda k: jnp.asarray(1e-4, jnp.float32))

        conv_kpts = nn.Conv(16, (1, 1), dtype=self.dtype,
                            name='conv_kpts') if cfg.pred_keypoints else None
        conv_bbox2d = nn.Conv(4, (1, 1), dtype=self.dtype,
                              name='conv_bbox2d') if cfg.pred_bbox2d \
            else None
        n_lvl = len(feats)
        if cfg.pred_keypoints:
            scale_kpts = self.param('scale_kpts', nn.initializers.ones,
                                    (n_lvl,), jnp.float32)
        if cfg.pred_bbox2d:
            scale_bbox2d = self.param('scale_bbox2d', nn.initializers.ones,
                                      (n_lvl,), jnp.float32)

        for lvl, (x, o) in enumerate(zip(feats, outs)):
            f = x
            for m in branch:
                f = m(f, train)
            depth_cls = conv_depth_cls(f)
            o['depth_cls_pred'] = depth_cls
            o['weight'] = jnp.concatenate(
                [m(x) for m in weight_convs], axis=-1)
            # lambda-fused depth (pgd_head.py:363-369)
            sig = jax.nn.sigmoid(fuse_lambda)
            direct = o['bbox_pred'][..., 2]
            prob = decode_prob_depth(depth_cls, cfg)
            fused = sig * direct + (1 - sig) * prob.astype(direct.dtype)
            o['bbox_pred'] = o['bbox_pred'].at[..., 2].set(fused)
            if cfg.pred_keypoints:
                # tanh(scale * pred): stride-normalized corner offsets
                # (PGDBBoxCoder.decode_2d, pgd_bbox_coder.py:46-51)
                o['kpts_pred'] = jnp.tanh(
                    conv_kpts(x).astype(jnp.float32) * scale_kpts[lvl])
            if cfg.pred_bbox2d:
                # relu(scale * pred): norm_on_bbox distances to the four
                # sides, in stride units (pgd_bbox_coder.py:53-65)
                o['bbox2d_pred'] = nn.relu(
                    conv_bbox2d(x).astype(jnp.float32) * scale_bbox2d[lvl])
        return outs


def uncertain_smooth_l1(pred, target, log_var, weights, alpha=1.0,
                        beta=1.0 / 9.0, avg_factor=None):
    """UncertainSmoothL1Loss: exp(-s) * smooth_l1 + alpha * s
    (reference models/losses/uncertain_smooth_l1_loss.py)."""
    diff = jnp.abs(pred - target)
    sl1 = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
    loss = jnp.exp(-log_var) * sl1 + alpha * log_var
    loss = loss * weights
    total = jnp.sum(loss)
    if avg_factor is not None:
        total = total / avg_factor
    return total


def pgd_loss(level_outs, points_np, cfg: PGDConfig, batch, cam2img=None,
             axis_name=None):
    """FCOS3D losses + PGD extras: uncertainty-weighted fused depth,
    keypoint loss, 2D box loss and projected-box consistency
    (reference pgd_head.py:526-751). `cam2img` (B, 4, 4) enables the
    projective terms."""
    losses = fcos3d_loss(level_outs, points_np, cfg, batch,
                         axis_name=axis_name)
    from .fcos_mono3d import fcos3d_targets_single
    points = jnp.asarray(np.concatenate(points_np, 0))
    strides_pp = jnp.asarray(np.concatenate([
        np.full(len(p), s, np.float32)
        for p, s in zip(points_np, cfg.strides)]))
    lo = jnp.asarray(np.concatenate([
        np.full(len(p), r[0], np.float32)
        for p, r in zip(points_np, cfg.regress_ranges)]))
    hi = jnp.asarray(np.concatenate([
        np.full(len(p), r[1], np.float32)
        for p, r in zip(points_np, cfg.regress_ranges)]))
    tg = jax.vmap(lambda b2, c2, dp, bc, gl, gm: fcos3d_targets_single(
        points, strides_pp, lo, hi, b2, c2, dp, bc, gl, gm, cfg))(
            batch['gt_bboxes2d'], batch['centers2d'],
            batch['gt_depths'], batch['gt_boxes_cam'],
            batch['gt_labels'], batch['gt_mask'])
    _, tgt3d, ctr_tgt, pos, argmin = tg
    w = pos.astype(jnp.float32)
    num_pos = jnp.maximum(w.sum(), 1.0)

    def flat(key, per):
        return jnp.concatenate(
            [o[key].astype(jnp.float32).reshape(o[key].shape[0], -1, per)
             for o in level_outs], axis=1)

    if cfg.use_depth_classifier and cfg.weight_dim > 0:
        depth_pred = flat('bbox_pred', 7)[..., 2]
        log_var = flat('weight', cfg.weight_dim)[..., 0]
        tgt_depth = jnp.where(pos, tgt3d[..., 2], 0.0)
        pred_depth = jnp.where(pos, depth_pred, 0.0)
        log_var = jnp.where(pos, log_var, 0.0)
        losses['loss_depth_uncertain'] = uncertain_smooth_l1(
            pred_depth, tgt_depth, log_var, w,
            alpha=cfg.uncertainty_alpha, avg_factor=num_pos)

    if cfg.pred_bbox2d:
        # targets: stride-normalized distances to the 2D box sides
        bbox2d_pred = flat('bbox2d_pred', 4)               # (B, P, 4)
        xs, ys = points[:, 0], points[:, 1]

        def b2d_single(b2, gi):
            g = b2[gi]                                     # (P, 4)
            t = jnp.stack([xs - g[:, 0], ys - g[:, 1],
                           g[:, 2] - xs, g[:, 3] - ys], -1)
            return t / strides_pp[:, None]
        b2d_tgt = jax.vmap(b2d_single)(batch['gt_bboxes2d'], argmin)
        b2d_tgt = jnp.where(pos[..., None], b2d_tgt, 0.0)
        b2d_p = jnp.where(pos[..., None], bbox2d_pred, 0.0)
        losses['loss_bbox2d'] = cfg.bbox2d_loss_weight * L.smooth_l1_loss(
            b2d_p, b2d_tgt, w[..., None] * ctr_tgt[..., None],
            avg_factor=num_pos)

    if cam2img is not None and (cfg.pred_keypoints or cfg.pred_bbox2d):
        from ...core.boxes import corners_cam
        from ...core.transforms import points_cam2img, points_img2cam
        from ...core.boxes import limit_period
        bbox_pred = flat('bbox_pred', 7)
        dir_pred = flat('dir_pred', 2)
        max_rr = strides_pp * cfg.regress_ranges[0][1] / cfg.strides[0]

        def proj_single(bp, dp_, t3, c2i):
            """Per-image projected corners of pred & GT boxes."""
            s = strides_pp[:, None]
            c2d_pred = points - bp[:, :2] * s              # (P, 2)
            c2d_tgt = points - t3[:, :2] * s
            depth_t = t3[:, 2]
            ctr3d_t = points_img2cam(
                jnp.concatenate([c2d_tgt, depth_t[:, None]], -1), c2i)
            # depth fixed to the target when re-projecting predictions
            # (pgd_head.py:399-401)
            ctr3d_p = points_img2cam(
                jnp.concatenate([c2d_pred, depth_t[:, None]], -1), c2i)
            # local -> global yaw (decode_yaw): ray angle at the center
            ray_p = jnp.arctan2(c2d_pred[:, 0] - c2i[0, 2], c2i[0, 0])
            ray_t = jnp.arctan2(c2d_tgt[:, 0] - c2i[0, 2], c2i[0, 0])
            dir_bin = jnp.argmax(dp_, axis=-1)
            yaw_loc = limit_period(bp[:, 6] - cfg.dir_offset, 0, np.pi) + \
                cfg.dir_offset + np.pi * dir_bin.astype(jnp.float32)
            yaw_p = yaw_loc + ray_p
            yaw_t = t3[:, 6] + ray_t
            dims_p = jnp.maximum(bp[:, 3:6], 1e-2)
            dims_t = jnp.maximum(t3[:, 3:6], 1e-2)
            # corners about the true center: corners_cam expects the
            # bottom-center origin (0.5, 1.0, 0.5) -> shift y by +h/2
            box_p = jnp.concatenate(
                [ctr3d_p[:, :1], ctr3d_p[:, 1:2] + dims_p[:, 1:2] / 2,
                 ctr3d_p[:, 2:3], dims_p, yaw_p[:, None]], -1)
            box_t = jnp.concatenate(
                [ctr3d_t[:, :1], ctr3d_t[:, 1:2] + dims_t[:, 1:2] / 2,
                 ctr3d_t[:, 2:3], dims_t, yaw_t[:, None]], -1)
            cp = points_cam2img(corners_cam(box_p), c2i)   # (P, 8, 2)
            ct = points_cam2img(corners_cam(box_t), c2i)
            return cp, ct

        cp, ct = jax.vmap(proj_single)(
            jnp.where(pos[..., None], bbox_pred, 0.0) +
            (~pos[..., None]) * 0.1,                       # safe dummies
            dir_pred, jnp.where(pos[..., None], tgt3d, 0.5),
            jnp.asarray(cam2img))

        if cfg.pred_keypoints:
            kpts_pred = flat('kpts_pred', 16)
            kpts_tgt = ((ct - points[None, :, None, :]) /
                        max_rr[None, :, None, None]).reshape(
                            ct.shape[0], ct.shape[1], 16)
            kpts_tgt = jnp.clip(kpts_tgt, -10.0, 10.0)
            kpts_tgt = jnp.where(pos[..., None], kpts_tgt, 0.0)
            kpts_p = jnp.where(pos[..., None], kpts_pred, 0.0)
            losses['loss_kpts'] = cfg.kpts_loss_weight * L.smooth_l1_loss(
                kpts_p, kpts_tgt, w[..., None] * ctr_tgt[..., None],
                avg_factor=num_pos)

        if cfg.pred_bbox2d:
            # consistency: GIoU between the exterior box of the
            # projected predicted 3D box and the direct 2D prediction
            proj_box = jnp.concatenate(
                [cp.min(axis=2), cp.max(axis=2)], axis=-1)  # (B, P, 4)
            s = strides_pp[None, :, None]
            direct_box = jnp.concatenate(
                [points[None, :, :] - bbox2d_pred[..., :2] * s,
                 points[None, :, :] + bbox2d_pred[..., 2:] * s], -1)
            proj_box = jnp.where(pos[..., None], proj_box, 0.0)
            direct_box = jnp.where(pos[..., None], direct_box, 0.0)
            losses['loss_consistency'] = cfg.consistency_loss_weight * \
                L.giou_loss_2d(proj_box, direct_box,
                               w * ctr_tgt, avg_factor=num_pos)
    return losses
