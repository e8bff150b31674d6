"""VoteNet indoor 3D detector (flax, static shapes).

Equivalent of the reference's inherited `VoteNet`
(mmdet3d/models/detectors/votenet.py + dense_heads/vote_head.py +
models/model_utils/vote_module.py): PointNet++ seeds -> per-seed vote
offsets -> FPS-clustered vote aggregation -> proposal head
(objectness, center residual, per-class size residual, heading bins).
All stages static shape: fixed seed/vote/proposal counts, chamfer-style
center loss over padded GT.
"""

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..backbones.pointnet2 import (PointNet2SASSG, batched_ball_group,
                                   batched_fps)

__all__ = ['VoteNet', 'VoteNetConfig', 'votenet_loss', 'votenet_predict']


@dataclasses.dataclass(frozen=True)
class VoteNetConfig:
    num_classes: int = 10
    num_heading_bins: int = 12
    num_proposals: int = 128
    vote_radius: float = 0.3
    vote_k: int = 16
    # per-class mean sizes (w, l, h); SUN RGB-D style defaults
    mean_sizes: Tuple[Tuple[float, float, float], ...] = tuple(
        (0.8, 0.8, 0.9) for _ in range(10))
    max_gt: int = 32
    score_thr: float = 0.05


class VoteNet(nn.Module):
    cfg: VoteNetConfig = dataclasses.field(default_factory=VoteNetConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points (B, N, 3+C) -> proposal dict. Fully batched: the
        geometry ops (FPS / ball query) are vmapped pure functions;
        every parameterized layer (incl. the backbone's BatchNorm)
        sees the whole batch — stateful flax modules must never sit
        inside a raw jax.vmap (mutable batch_stats leak as tracers)."""
        cfg = self.cfg
        backbone = PointNet2SASSG(dtype=self.dtype, name='backbone')
        vote_mlp = [nn.Dense(256, dtype=self.dtype, name=f'vote{i}')
                    for i in range(2)]
        vote_out = nn.Dense(3 + 256, dtype=self.dtype, name='vote_out')
        prop_mlp = [nn.Dense(128, dtype=self.dtype, name=f'prop{i}')
                    for i in range(2)]
        head_out = nn.Dense(2 + 3 + cfg.num_classes * 3 +
                            cfg.num_heading_bins * 2 + cfg.num_classes,
                            dtype=self.dtype, name='head_out')

        seed_xyz, seed_f = backbone(points.astype(self.dtype), train)
        x = seed_f
        for m in vote_mlp:
            x = nn.relu(m(x))
        v = vote_out(x)
        vote_xyz = seed_xyz + v[..., :3]
        vote_f = seed_f + v[..., 3:]

        # cluster votes: FPS centers + ball aggregation (per sample)
        cidx = batched_fps(vote_xyz, cfg.num_proposals)
        centers = jnp.take_along_axis(vote_xyz, cidx[..., None], axis=1)
        g = batched_ball_group(vote_xyz, vote_f, centers,
                               cfg.vote_radius, cfg.vote_k)
        y = g
        for m in prop_mlp:
            y = nn.relu(m(y))
        agg = y.max(axis=2)
        out = head_out(agg).astype(jnp.float32)
        return dict(seed_xyz=seed_xyz, vote_xyz=vote_xyz,
                    centers=centers, raw=out)


def _split_raw(raw, cfg):
    c = cfg.num_classes
    hb = cfg.num_heading_bins
    i = 0
    obj = raw[..., i:i + 2]; i += 2
    center_res = raw[..., i:i + 3]; i += 3
    size_res = raw[..., i:i + 3 * c].reshape(raw.shape[:-1] + (c, 3))
    i += 3 * c
    head_cls = raw[..., i:i + hb]; i += hb
    head_res = raw[..., i:i + hb]; i += hb
    sem = raw[..., i:i + c]
    return obj, center_res, size_res, head_cls, head_res, sem


def votenet_loss(outputs, batch, cfg: VoteNetConfig):
    """Simplified VoteNet loss family (vote + objectness + center +
    size/heading/sem at positives). batch: gt_boxes (B, G, 7) gravity
    centers, gt_labels, gt_mask."""
    obj, center_res, size_res, head_cls, head_res, sem = _split_raw(
        outputs['raw'], cfg)
    centers = outputs['centers'] + center_res
    gt_c = batch['gt_boxes'][..., :3]
    gt_mask = batch['gt_mask']

    d2 = jnp.sum((centers[:, :, None] - gt_c[:, None]) ** 2, -1)
    d2 = jnp.where(gt_mask[:, None, :], d2, jnp.inf)
    near = jnp.min(d2, -1)
    gi = jnp.argmin(d2, -1)
    has_gt = gt_mask.any(-1, keepdims=True)
    pos = (near < 0.3 ** 2) & has_gt
    neg = (near > 0.6 ** 2) | ~has_gt
    w_pos = pos.astype(jnp.float32)
    npos = jnp.maximum(w_pos.sum(), 1.0)

    logp = jax.nn.log_softmax(obj, -1)
    loss_obj = -(w_pos * logp[..., 1] +
                 neg.astype(jnp.float32) * logp[..., 0]).sum() / \
        jnp.maximum((pos | neg).sum(), 1)

    def at_gt(x):
        return jnp.take_along_axis(x, gi[..., None], 1)

    gt_sel = jnp.take_along_axis(batch['gt_boxes'], gi[..., None], 1)
    loss_center = (jnp.where(pos, jnp.sqrt(near + 1e-9), 0.0)
                   ).sum() / npos

    lbl = jnp.take_along_axis(batch['gt_labels'], gi, 1)
    sem_lp = jax.nn.log_softmax(sem, -1)
    loss_sem = -(jnp.take_along_axis(sem_lp, lbl[..., None], -1)[..., 0]
                 * w_pos).sum() / npos

    mean = jnp.asarray(cfg.mean_sizes)[lbl]
    sres = jnp.take_along_axis(
        size_res, lbl[..., None, None].repeat(3, -1), 2)[:, :, 0]
    loss_size = (jnp.abs(sres - (gt_sel[..., 3:6] - mean) / mean)
                 .sum(-1) * w_pos).sum() / npos

    yaw = gt_sel[..., 6]
    bin_w = 2 * np.pi / cfg.num_heading_bins
    bin_id = jnp.floor((yaw % (2 * np.pi)) / bin_w).astype(jnp.int32)
    hc_lp = jax.nn.log_softmax(head_cls, -1)
    loss_hcls = -(jnp.take_along_axis(hc_lp, bin_id[..., None],
                                      -1)[..., 0] * w_pos).sum() / npos
    res_t = (yaw % (2 * np.pi)) - (bin_id + 0.5) * bin_w
    hres = jnp.take_along_axis(head_res, bin_id[..., None], -1)[..., 0]
    loss_hres = (jnp.abs(hres - res_t / bin_w) * w_pos).sum() / npos

    # vote loss: seeds near a gt should vote to its center
    sd2 = jnp.sum((outputs['vote_xyz'][:, :, None] - gt_c[:, None])**2,
                  -1)
    sd2 = jnp.where(gt_mask[:, None, :], sd2, jnp.inf)
    snear = jnp.min(sd2, -1)
    sval = (snear < 1.0) & has_gt
    loss_vote = (jnp.where(sval, jnp.sqrt(snear + 1e-9), 0.0)).sum() / \
        jnp.maximum(sval.sum(), 1.0)

    losses = dict(loss_objectness=loss_obj, loss_center=loss_center,
                  loss_sem=loss_sem, loss_size=loss_size,
                  loss_heading_cls=loss_hcls, loss_heading_res=loss_hres,
                  loss_vote=loss_vote)
    return sum(losses.values()), losses


def votenet_predict(outputs, cfg: VoteNetConfig):
    """Decode proposals -> (B, P, 7) boxes + scores + labels."""
    obj, center_res, size_res, head_cls, head_res, sem = _split_raw(
        outputs['raw'], cfg)
    centers = outputs['centers'] + center_res
    scores = jax.nn.softmax(obj, -1)[..., 1]
    labels = jnp.argmax(sem, -1)
    mean = jnp.asarray(cfg.mean_sizes)[labels]
    sres = jnp.take_along_axis(
        size_res, labels[..., None, None].repeat(3, -1), 2)[:, :, 0]
    dims = jnp.maximum(mean * (1 + sres), 1e-2)
    bin_w = 2 * np.pi / cfg.num_heading_bins
    bid = jnp.argmax(head_cls, -1)
    hres = jnp.take_along_axis(head_res, bid[..., None], -1)[..., 0]
    yaw = (bid + 0.5) * bin_w + hres * bin_w
    yaw = (yaw + np.pi) % (2 * np.pi) - np.pi
    boxes = jnp.concatenate([centers, dims, yaw[..., None]], -1)
    scores = jnp.where(scores > cfg.score_thr, scores, 0.0)
    return dict(boxes_3d=boxes, scores_3d=scores, labels_3d=labels)
