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


def pgd_loss(level_outs, points_np, cfg: PGDConfig, batch, axis_name=None):
    """FCOS3D losses + uncertainty-weighted depth loss on the fused
    depth (the base loss already sees the fused depth via bbox_pred)."""
    losses = fcos3d_loss(level_outs, points_np, cfg, batch,
                         axis_name=axis_name)
    if cfg.use_depth_classifier and cfg.weight_dim > 0:
        # re-derive positives cheaply from the base targets
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
        _, tgt3d, _, pos = tg
        depth_pred = jnp.concatenate(
            [o['bbox_pred'][..., 2].astype(jnp.float32).reshape(
                o['bbox_pred'].shape[0], -1) for o in level_outs], axis=1)
        log_var = jnp.concatenate(
            [o['weight'][..., 0].astype(jnp.float32).reshape(
                o['weight'].shape[0], -1) for o in level_outs], axis=1)
        w = pos.astype(jnp.float32)
        num_pos = jnp.maximum(w.sum(), 1.0)
        tgt_depth = jnp.where(pos, tgt3d[..., 2], 0.0)
        pred_depth = jnp.where(pos, depth_pred, 0.0)
        log_var = jnp.where(pos, log_var, 0.0)
        losses['loss_depth_uncertain'] = uncertain_smooth_l1(
            pred_depth, tgt_depth, log_var, w,
            alpha=cfg.uncertainty_alpha, avg_factor=num_pos)
    return losses
