"""ImVoteNet: image-vote fusion for indoor point detection (flax).

Equivalent of the reference's `ImVoteNet`
(mmdet3d/models/detectors/imvotenet.py:56-554) with the `VoteFusion`
layer (fusion_layers/vote_fusion.py:13-200): 2D detections are lifted
into per-seed image cues —

  * geometric (5): the pseudo-3D vote from the 2D box center
    (delta-uv back-projected at the seed depth), expressed as the
    lifted xz displacement + the normalized ray direction;
  * semantic (num_classes): the detection confidence scattered at its
    class;
  * texture (3): the normalized RGB at the seed's pixel —

and three VoteNet towers (joint / points-only / image-only) are
trained jointly (weights from the upstream imvotenet_stage2 config),
with the JOINT tower serving predictions.

TPU-first factorization: the frozen 2D branch is decoupled — 2D boxes
arrive as a static-size input (M slots `(l, t, r, b, conf, cls)` +
validity implied by conf > 0), so any 2D detector (the repo's ATSS2D /
KITTI-mono path, or offline dumps) can feed it, and the whole fusion +
three towers stay inside one jit. Per-seed top-`max_imvote_per_pixel`
box selection replaces the reference's dynamic valid-seed resampling
(sample_valid_seeds) with masked static slots.
"""

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.pointnet2 import (PointNet2SASSG, batched_ball_group,
                                   batched_fps)
from .votenet import VoteNetConfig, _split_raw, votenet_loss, \
    votenet_predict

__all__ = ['ImVoteNet', 'ImVoteNetConfig', 'imvotenet_loss',
           'imvotenet_predict', 'vote_fusion_cues']


@dataclasses.dataclass(frozen=True)
class ImVoteNetConfig(VoteNetConfig):
    max_imvote_per_pixel: int = 3
    img_feat_dim: int = 128
    loss_weights: Tuple[float, float, float] = (0.4, 0.3, 0.3)
    # In-graph 2D branch (reference imvotenet.py:56-554 joint
    # structure: img backbone + head live INSIDE the detector; the
    # stage-2 recipe freezes them — freeze_img_branch=True,
    # imvotenet.py:129-131,171-215 — which stop_gradient reproduces).
    # False keeps the decoupled static-box input path.
    with_img_branch: bool = False
    freeze_img_branch: bool = True
    img_backbone_depth: int = 18
    img_max_boxes: int = 16
    img_loss_weight: float = 1.0


def vote_fusion_cues(seeds, bboxes_2d, img, depth2img, num_classes,
                     max_per=3):
    """Per-seed image cues (reference vote_fusion.py:76-190).

    Args:
        seeds: (S, 3) depth-frame seed points.
        bboxes_2d: (M, 6) = (l, t, r, b, conf, cls); conf <= 0 = pad.
        img: (H, W, 3) uint8/float image.
        depth2img: (3, 4) or (4, 4) projection.
        max_per: image votes kept per seed.

    Returns:
        cues (S, max_per, 5 + num_classes), txt (S, 3), mask
        (S, max_per).
    """
    h, w = img.shape[:2]
    d2i = jnp.asarray(depth2img, jnp.float32)
    if d2i.shape[0] == 3:
        d2i = jnp.concatenate(
            [d2i, jnp.asarray([[0., 0., 0., 1.]])], axis=0)
    homo = jnp.concatenate([seeds, jnp.ones_like(seeds[:, :1])], -1)
    proj = homo @ d2i.T                                  # (S, 4)
    z = jnp.maximum(proj[:, 2], 1e-5)
    uv = proj[:, :2] / z[:, None]                        # (S, 2)

    l, t, r, b = (bboxes_2d[:, i] for i in range(4))
    conf = bboxes_2d[:, 4]
    cls = bboxes_2d[:, 5].astype(jnp.int32)
    valid_box = conf > 0

    in_x = (uv[:, None, 0] > l[None]) & (uv[:, None, 0] < r[None])
    in_y = (uv[:, None, 1] > t[None]) & (uv[:, None, 1] < b[None])
    in_box = in_x & in_y & valid_box[None]               # (S, M)

    # geometric cue: 2D-center delta lifted at the seed depth
    du = (l + r)[None] / 2 - uv[:, :1]                  # (S, M)
    dv = (t + b)[None] / 2 - uv[:, 1:2]
    d2i_inv = jnp.linalg.inv(d2i)
    dvec = jnp.stack([du * z[:, None], dv * z[:, None],
                      jnp.zeros_like(du), jnp.zeros_like(du)], -1)
    imvote = (dvec @ d2i_inv.T)[..., :3]                # (S, M, 3)
    ray = seeds[:, None, :] + imvote
    ray = ray / jnp.sqrt(jnp.sum(ray ** 2, -1, keepdims=True) + 1e-8)
    xz = ray[..., [0, 2]] / (ray[..., 1:2] + 1e-8) * \
        seeds[:, None, 1:2] - seeds[:, None, [0, 2]]
    geo = jnp.concatenate([xz, ray], -1)                 # (S, M, 5)
    sem = jax.nn.one_hot(cls, num_classes) * conf[:, None]
    sem = jnp.broadcast_to(sem[None], geo.shape[:2] + (num_classes,))
    cues = jnp.concatenate([geo, sem], -1)
    cues = cues * in_box[..., None]

    score = in_box.astype(jnp.float32) + conf[None] * valid_box[None]
    top_s, top_i = jax.lax.top_k(score, min(max_per, score.shape[1]))
    cues = jnp.take_along_axis(cues, top_i[..., None], axis=1)
    mask = jnp.take_along_axis(in_box, top_i, axis=1)
    cues = cues * mask[..., None]

    ui = jnp.clip(jnp.round(uv[:, 0]), 0, w - 1).astype(jnp.int32)
    vi = jnp.clip(jnp.round(uv[:, 1]), 0, h - 1).astype(jnp.int32)
    txt = img[vi, ui].astype(jnp.float32) / 255.0        # (S, 3)
    return cues, txt, mask


class _VoteTower(nn.Module):
    """Vote -> FPS cluster -> proposal head (the VoteNet trunk on a
    given per-seed feature set)."""
    cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seed_xyz, seed_f):
        cfg = self.cfg
        x = seed_f
        for i in range(2):
            x = nn.relu(nn.Dense(256, dtype=self.dtype,
                                 name=f'vote{i}')(x))
        v = nn.Dense(3 + 256, dtype=self.dtype, name='vote_out')(x)
        vote_xyz = seed_xyz + v[..., :3]
        vote_f = nn.Dense(256, dtype=self.dtype,
                          name='skip')(seed_f) + v[..., 3:]
        cidx = batched_fps(vote_xyz, cfg.num_proposals)
        centers = jnp.take_along_axis(vote_xyz, cidx[..., None], axis=1)
        g = batched_ball_group(vote_xyz, vote_f, centers,
                               cfg.vote_radius, cfg.vote_k)
        y = g
        for i in range(2):
            y = nn.relu(nn.Dense(128, dtype=self.dtype,
                                 name=f'prop{i}')(y))
        agg = y.max(axis=2)
        out = nn.Dense(2 + 3 + cfg.num_classes * 3 +
                       cfg.num_heading_bins * 2 + cfg.num_classes,
                       dtype=self.dtype, name='head_out')(agg)
        return dict(seed_xyz=seed_xyz, vote_xyz=vote_xyz,
                    centers=centers, raw=out.astype(jnp.float32))


class ImVoteNet(nn.Module):
    cfg: ImVoteNetConfig = dataclasses.field(
        default_factory=ImVoteNetConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, img, bboxes_2d, depth2img,
                 train: bool = False):
        """points (B, N, 3+C), img (B, H, W, 3), bboxes_2d (B, M, 6),
        depth2img (B, 4, 4) -> dict of tower outputs."""
        cfg = self.cfg
        backbone = PointNet2SASSG(dtype=self.dtype, name='backbone')
        seed_xyz, seed_f = backbone(points.astype(self.dtype), train)

        outs_2d = None
        if cfg.with_img_branch:
            # joint structure: the 2D detector runs in-graph on `img`
            # and its decoded top-k boxes REPLACE the static
            # `bboxes_2d` input (reference extract_bboxes_2d,
            # imvotenet.py:310-360)
            from ..backbones.liga_resnet import LIGAResNet
            from ..heads.atss2d import (ATSS2DConfig, ATSS2DHead,
                                        atss2d_decode)
            from ..necks.fpn import FPN
            feats = LIGAResNet(depth=cfg.img_backbone_depth,
                               strides=(1, 2, 2, 2),
                               dilations=(1, 1, 1, 1),
                               num_channels_factor=(1, 2, 4, 8),
                               out_indices=(1, 2, 3),
                               with_max_pool=True, norm='bn',
                               dtype=self.dtype,
                               name='img_backbone')(
                                   img.astype(self.dtype), train)
            fpn = FPN(out_channels=64, num_outs=5, dtype=self.dtype,
                      name='img_neck')(feats, train)
            acfg = ATSS2DConfig(num_classes=cfg.num_classes,
                                in_channels=64, feat_channels=64,
                                stacked_convs=1,
                                strides=(8, 16, 32, 64, 128))
            outs_2d = ATSS2DHead(cfg=acfg, dtype=self.dtype,
                                 name='img_bbox_head')(fpn, train)
            dec = atss2d_decode(outs_2d, img.shape[1:3], acfg,
                                cfg.img_max_boxes)
            if cfg.freeze_img_branch:
                dec = jax.lax.stop_gradient(dec)
                outs_2d = None          # no 2D loss in stage-2 mode
            bboxes_2d = dec

        cues, txt, mask = jax.vmap(
            lambda s, bb, im, d: vote_fusion_cues(
                s, bb, im, d, cfg.num_classes,
                cfg.max_imvote_per_pixel))(
                    seed_xyz.astype(jnp.float32), bboxes_2d, img,
                    depth2img)
        # collapse the per-seed vote slots with a max over valid cues
        # (static replacement for the reference's valid-seed resample)
        img_cue = jnp.where(mask[..., None], cues,
                            -jnp.inf).max(axis=2)
        img_cue = jnp.where(jnp.isfinite(img_cue), img_cue, 0.0)
        img_feat = jnp.concatenate([img_cue, txt], -1).astype(self.dtype)
        img_feat = nn.relu(nn.Dense(cfg.img_feat_dim, dtype=self.dtype,
                                    name='img_mlp')(img_feat))

        towers = {}
        towers['joint'] = _VoteTower(cfg, self.dtype, name='joint')(
            seed_xyz, jnp.concatenate([seed_f, img_feat], -1))
        towers['pts'] = _VoteTower(cfg, self.dtype, name='pts')(
            seed_xyz, seed_f)
        towers['img'] = _VoteTower(cfg, self.dtype, name='img')(
            seed_xyz, img_feat)
        if outs_2d is not None:
            towers['outs_2d'] = outs_2d
        return towers


def imvotenet_loss(outputs, batch, cfg: ImVoteNetConfig):
    """Weighted sum of the three towers' VoteNet losses
    (reference imvotenet.py forward_train; weights = joint/pts/img)."""
    total = 0.0
    losses = {}
    for w, name in zip(cfg.loss_weights, ('joint', 'pts', 'img')):
        t, parts = votenet_loss(outputs[name], batch, cfg)
        total = total + w * t
        for k, v in parts.items():
            losses[f'{name}_{k}'] = v * w
    if 'outs_2d' in outputs and 'gt_bboxes2d' in batch:
        # stage-1 joint path: the trainable img branch also pays the
        # ATSS 2D loss (reference forward_train img branch losses)
        from ..heads.atss2d import ATSS2DConfig, atss2d_loss
        acfg = ATSS2DConfig(num_classes=cfg.num_classes,
                            strides=(8, 16, 32, 64, 128),
                            stacked_convs=1, feat_channels=64)
        l2d = atss2d_loss(outputs['outs_2d'], batch['img_hw'], batch,
                          acfg)
        for k, v in l2d.items():
            losses[k] = v * cfg.img_loss_weight
            total = total + losses[k]
    return total, losses


def imvotenet_predict(outputs, cfg: ImVoteNetConfig):
    """Joint-tower decode (reference simple_test uses the joint head)."""
    return votenet_predict(outputs['joint'], cfg)
