"""FCOS3D monocular head (flax module + functional targets/loss/decode).

Equivalent of the reference's `FCOSMono3DHead` / `AnchorFreeMono3DHead`
(mmdet3d/models/dense_heads/{fcos_mono3d_head.py,
anchor_free_mono3d_head.py}) and `FCOS3DBBoxCoder`
(core/bbox/coders/fcos3d_bbox_coder.py):

* shared cls/reg towers + per-branch heads producing, per FPN level:
  class scores, (offset 2, depth 1, size 3, rot 1) regressions,
  direction bins, centerness; learnable per-level scales on
  offset/depth/size; depth/size decoded with exp;
* center-sampling target assignment around projected 3D centers with
  per-level regress ranges, centerness = exp(-alpha * ||offset||/
  (sqrt(2) stride)) (fcos_mono3d_head.py:852-956);
* inference: offsets+points -> centers2d, back-project with depth,
  local->global yaw via decode_yaw, multi-class rotated NMS in
  pseudo-lidar BEV.

Static shapes throughout: per-level point sets are fixed; GT padded.
"""

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import losses as L
from ...core.boxes import cam_to_pseudo_lidar_boxes
from ...core.nms import box3d_multiclass_nms
from ...core.transforms import limit_period, points_img2cam

INF = 1e8


@dataclasses.dataclass(frozen=True)
class FCOS3DConfig:
    num_classes: int = 3
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 2
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    regress_ranges: Tuple[Tuple[float, float], ...] = (
        (-1, 48), (48, 96), (96, 192), (192, 384), (384, INF))
    center_sample_radius: float = 1.5
    centerness_alpha: float = 2.5
    dir_offset: float = 0.7854
    diff_rad_by_sin: bool = True
    norm_on_bbox: bool = True
    max_gt: int = 32
    # nuScenes extensions (reference AnchorFreeMono3DHead pred_attrs /
    # pred_velo, anchor_free_mono3d_head.py:181-283): attribute branch
    # on the cls tower, velocity appended to the bbox code (9-dim)
    pred_attrs: bool = False
    num_attrs: int = 9
    attr_branch_channels: int = 64
    pred_velo: bool = False
    # test
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_thr: float = 0.25
    max_num: int = 100
    # losses
    loss_weights: Any = None


class FCOSMono3DHead(nn.Module):
    """Forward module over FPN levels."""
    cfg: FCOS3DConfig = dataclasses.field(default_factory=FCOS3DConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cfg = self.cfg
        from ..layers import ConvNorm
        outs = []
        # shared towers (parameters shared across levels, like the ref)
        towers = {}
        for branch in ('cls', 'reg'):
            towers[branch] = [
                ConvNorm(cfg.feat_channels, (3, 3), norm='gn',
                         dtype=self.dtype, name=f'{branch}_tower{i}')
                for i in range(cfg.stacked_convs)
            ]
        conv_cls = nn.Conv(cfg.num_classes, (3, 3),
                           padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           name='conv_cls')
        reg_dim = 7 + (2 if cfg.pred_velo else 0)
        conv_reg = nn.Conv(reg_dim, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name='conv_reg')
        conv_dir = nn.Conv(2, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name='conv_dir')
        conv_ctr = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name='conv_centerness')
        if cfg.pred_attrs:
            attr_tower = ConvNorm(cfg.attr_branch_channels, (3, 3),
                                  norm='gn', dtype=self.dtype,
                                  name='attr_tower0')
            conv_attr = nn.Conv(cfg.num_attrs, (3, 3),
                                padding=[(1, 1), (1, 1)],
                                dtype=self.dtype, name='conv_attr')
        scales = self.param('scales', nn.initializers.ones,
                            (len(cfg.strides), 3), jnp.float32)

        for lvl, x in enumerate(feats):
            cls_feat = x
            reg_feat = x
            for m in towers['cls']:
                cls_feat = m(cls_feat, train)
            for m in towers['reg']:
                reg_feat = m(reg_feat, train)
            cls_score = conv_cls(cls_feat)
            bbox_pred = conv_reg(reg_feat).astype(jnp.float32)
            dir_pred = conv_dir(reg_feat)
            centerness = conv_ctr(reg_feat)
            # learnable scales on offset / depth / size + exp decode
            s = scales[lvl]
            offset = bbox_pred[..., :2] * s[0]
            depth = jnp.exp(bbox_pred[..., 2:3] * s[1])
            size = jnp.exp(bbox_pred[..., 3:6] * s[2])
            rot = bbox_pred[..., 6:7]
            parts = [offset, depth, size, rot]
            if cfg.pred_velo:
                parts.append(bbox_pred[..., 7:9])   # raw (no scale/exp)
            bbox_out = jnp.concatenate(parts, axis=-1)
            out = dict(cls_score=cls_score, bbox_pred=bbox_out,
                       dir_pred=dir_pred, centerness=centerness)
            if cfg.pred_attrs:
                out['attr_pred'] = conv_attr(attr_tower(cls_feat, train))
            outs.append(out)
        return outs


def level_points(featmap_size, stride):
    """(H*W, 2) pixel coordinates of feature locations (mmdet convention:
    stride/2 offset)."""
    h, w = featmap_size
    ys = (np.arange(h, dtype=np.float32) * stride) + stride // 2
    xs = (np.arange(w, dtype=np.float32) * stride) + stride // 2
    yy, xx = np.meshgrid(ys, xs, indexing='ij')
    return np.stack([xx, yy], -1).reshape(-1, 2)


def fcos3d_targets_single(points, strides_per_point, regress_lo, regress_hi,
                          gt_bboxes2d, centers2d, depths, gt_boxes_cam,
                          gt_labels, gt_mask, cfg: FCOS3DConfig):
    """Targets for one image over the concatenated level points.

    Args:
        points: (P, 2); strides_per_point: (P,).
        regress_lo/hi: (P,) per-point regress range.
        gt_bboxes2d: (G, 4) xyxy; centers2d: (G, 2); depths: (G,).
        gt_boxes_cam: (G, 7) camera-frame (x,y,z,w,h,l... code order
            (x, y, z, dx(l), dy(h), dz(w), yaw) as stored by the mono
            pipeline); gt_labels: (G,); gt_mask: (G,).

    Returns:
        labels (P,), bbox_targets_3d (P, 7), centerness_targets (P,),
        pos_mask (P,).
    """
    p = points.shape[0]
    g = gt_bboxes2d.shape[0]
    xs = points[:, 0:1]
    ys = points[:, 1:2]

    # global -> local (allocentric) yaw (fcos_mono3d_head.py:871-873)
    local_yaw = -jnp.arctan2(gt_boxes_cam[:, 0], gt_boxes_cam[:, 2]) + \
        gt_boxes_cam[:, 6]

    delta = jnp.stack(
        [xs - centers2d[None, :, 0], ys - centers2d[None, :, 1]],
        axis=-1)                                     # (P, G, 2)
    bbox_targets_3d = jnp.concatenate([
        delta,
        jnp.broadcast_to(depths[None, :, None], (p, g, 1)),
        jnp.broadcast_to(gt_boxes_cam[None, :, 3:6], (p, g, 3)),
        jnp.broadcast_to(local_yaw[None, :, None], (p, g, 1)),
    ], axis=-1)                                      # (P, G, 7)

    left = xs - gt_bboxes2d[None, :, 0]
    right = gt_bboxes2d[None, :, 2] - xs
    top = ys - gt_bboxes2d[None, :, 1]
    bottom = gt_bboxes2d[None, :, 3] - ys
    max_regress = jnp.maximum(jnp.maximum(left, right),
                              jnp.maximum(top, bottom))  # (P, G)

    radius = strides_per_point[:, None] * cfg.center_sample_radius
    inside_center = (jnp.abs(xs - centers2d[None, :, 0]) < radius) & \
        (jnp.abs(ys - centers2d[None, :, 1]) < radius)
    inside_range = (max_regress >= regress_lo[:, None]) & \
        (max_regress <= regress_hi[:, None])

    dists = jnp.sqrt(jnp.sum(delta**2, axis=-1))     # (P, G)
    dists = jnp.where(inside_center & inside_range & gt_mask[None, :],
                      dists, INF)
    min_dist = dists.min(axis=1)
    argmin = dists.argmin(axis=1)
    pos = min_dist < INF

    labels = jnp.where(pos, gt_labels[argmin], cfg.num_classes)
    tgt = bbox_targets_3d[jnp.arange(p), argmin]
    if cfg.norm_on_bbox:
        tgt = tgt.at[:, :2].divide(strides_per_point[:, None])
    rel = jnp.sqrt(jnp.sum(tgt[:, :2]**2, axis=-1)) / 1.414
    centerness = jnp.exp(-cfg.centerness_alpha * rel)
    return labels.astype(jnp.int32), tgt, centerness, pos, argmin


def fcos3d_loss(level_outs, points_np, cfg: FCOS3DConfig, batch,
                axis_name=None):
    """Total loss (reference fcos_mono3d_head.py `loss`).

    Args:
        level_outs: list of per-level dicts from the head.
        points_np: list of (P_l, 2) numpy point arrays.
        batch: dict with 'gt_bboxes2d' (B,G,4), 'centers2d' (B,G,2),
            'gt_depths' (B,G), 'gt_boxes_cam' (B,G,7), 'gt_labels' (B,G),
            'gt_mask' (B,G).
    """
    points = jnp.asarray(np.concatenate(points_np, 0))
    strides_pp = jnp.asarray(np.concatenate([
        np.full(len(pts), s, np.float32)
        for pts, s in zip(points_np, cfg.strides)]))
    lo = jnp.asarray(np.concatenate([
        np.full(len(pts), r[0], np.float32)
        for pts, r in zip(points_np, cfg.regress_ranges)]))
    hi = jnp.asarray(np.concatenate([
        np.full(len(pts), r[1], np.float32)
        for pts, r in zip(points_np, cfg.regress_ranges)]))

    def flat(key, per):
        return jnp.concatenate([
            o[key].astype(jnp.float32).reshape(o[key].shape[0], -1, per)
            for o in level_outs], axis=1)

    code = 7 + (2 if cfg.pred_velo else 0)
    cls_score = flat('cls_score', cfg.num_classes)   # (B, P, C)
    bbox_pred_full = flat('bbox_pred', code)
    bbox_pred = bbox_pred_full[..., :7]
    dir_pred = flat('dir_pred', 2)
    centerness = flat('centerness', 1)[..., 0]

    tg = jax.vmap(lambda b2, c2, dp, bc, gl, gm: fcos3d_targets_single(
        points, strides_pp, lo, hi, b2, c2, dp, bc, gl, gm, cfg))(
            batch['gt_bboxes2d'], batch['centers2d'], batch['gt_depths'],
            batch['gt_boxes_cam'], batch['gt_labels'], batch['gt_mask'])
    labels, tgt3d, ctr_tgt, pos, _ = tg

    num_pos = pos.sum().astype(jnp.float32)
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
    num_pos = jnp.maximum(num_pos, 1.0)

    loss_cls = L.sigmoid_focal_loss(cls_score, labels, avg_factor=num_pos)

    w = pos.astype(jnp.float32)
    pred = bbox_pred
    tgt = tgt3d
    if cfg.diff_rad_by_sin:
        from ...core.targets import add_sin_difference
        pred, tgt = add_sin_difference(pred, tgt)
    # sanitize targets at non-positives (they may contain INF-ish deltas)
    tgt = jnp.where(pos[..., None], tgt, 0.0)
    pred = jnp.where(pos[..., None], pred, 0.0)
    loss_offset = L.smooth_l1_loss(pred[..., :2], tgt[..., :2],
                                   w[..., None], avg_factor=num_pos)
    loss_depth = L.smooth_l1_loss(pred[..., 2], tgt[..., 2], w,
                                  avg_factor=num_pos)
    loss_size = L.smooth_l1_loss(pred[..., 3:6], tgt[..., 3:6],
                                 w[..., None], avg_factor=num_pos)
    loss_rotsin = L.smooth_l1_loss(pred[..., 6], tgt[..., 6], w,
                                   avg_factor=num_pos)

    from ...core.targets import get_direction_target
    dir_tgt = get_direction_target(jnp.zeros_like(tgt3d[..., 6]),
                                   tgt3d[..., 6], cfg.dir_offset)
    loss_dir = L.softmax_cross_entropy(dir_pred, dir_tgt, w,
                                       avg_factor=num_pos)
    loss_ctr = L.binary_cross_entropy(centerness, ctr_tgt, w,
                                      avg_factor=num_pos)
    losses = dict(loss_cls=loss_cls, loss_offset=loss_offset,
                  loss_depth=loss_depth, loss_size=loss_size,
                  loss_rotsin=loss_rotsin, loss_dir=loss_dir,
                  loss_centerness=loss_ctr)

    argmin = tg[4]
    if cfg.pred_velo and 'gt_velocities' in batch:
        velo_tgt = jax.vmap(lambda v, a: v[a])(batch['gt_velocities'],
                                               argmin)
        velo_pred = jnp.where(pos[..., None], bbox_pred_full[..., 7:9],
                              0.0)
        velo_tgt = jnp.where(pos[..., None], velo_tgt, 0.0)
        losses['loss_velo'] = L.smooth_l1_loss(
            velo_pred, velo_tgt, w[..., None], avg_factor=num_pos) * 0.05
    if cfg.pred_attrs and 'gt_attr_labels' in batch:
        attr_pred = flat('attr_pred', cfg.num_attrs)
        attr_tgt = jax.vmap(lambda a, i: a[i])(batch['gt_attr_labels'],
                                               argmin).astype(jnp.int32)
        losses['loss_attr'] = L.softmax_cross_entropy(
            attr_pred, jnp.clip(attr_tgt, 0, cfg.num_attrs - 1), w,
            avg_factor=num_pos)
    return losses


def fcos3d_get_bboxes(level_outs, points_np, cam2img, cfg: FCOS3DConfig):
    """Decode + NMS -> padded detections in the CAMERA frame
    (+ pseudo-lidar BEV used for rotated NMS).

    Args:
        level_outs: per-level head outputs (test mode: offsets already
            scaled by the coder at train res; here offsets are multiplied
            by stride as in FCOS3DBBoxCoder.decode when not training).
        cam2img: (B, 4, 4).

    Returns:
        dict of (B, max_num, ...) padded camera-frame boxes7 + scores /
        labels / mask.
    """
    b = level_outs[0]['cls_score'].shape[0]
    code = 7 + (2 if cfg.pred_velo else 0)

    per_level_all = []
    for o, pts, stride in zip(level_outs, points_np, cfg.strides):
        c = o['cls_score'].shape[-1]
        scores = jax.nn.sigmoid(
            o['cls_score'].astype(jnp.float32)).reshape(b, -1, c)
        ctr = jax.nn.sigmoid(
            o['centerness'].astype(jnp.float32)).reshape(b, -1)
        bbox = o['bbox_pred'].astype(jnp.float32).reshape(b, -1, code)
        if cfg.norm_on_bbox:
            bbox = bbox.at[..., :2].multiply(stride)
        dirc = jnp.argmax(o['dir_pred'].reshape(b, -1, 2), axis=-1)
        if cfg.pred_attrs:
            attr = jnp.argmax(
                o['attr_pred'].reshape(b, -1, cfg.num_attrs), axis=-1)
        else:
            attr = jnp.zeros(bbox.shape[:2], jnp.int32)
        pts_j = jnp.asarray(pts)
        # targets encode delta = point - center => center = point - delta
        centers2d = pts_j[None] - bbox[..., :2]
        per_level_all.append((scores, ctr, bbox, dirc, centers2d, attr))

    scores = jnp.concatenate([x[0] for x in per_level_all], axis=1)
    ctr = jnp.concatenate([x[1] for x in per_level_all], axis=1)
    bbox = jnp.concatenate([x[2] for x in per_level_all], axis=1)
    dirc = jnp.concatenate([x[3] for x in per_level_all], axis=1)
    centers2d = jnp.concatenate([x[4] for x in per_level_all], axis=1)
    attrs = jnp.concatenate([x[5] for x in per_level_all], axis=1)

    def single(scores_i, ctr_i, bbox_i, dir_i, c2d_i, attr_i, c2i):
        ranked = scores_i.max(axis=-1) * ctr_i
        k = min(cfg.nms_pre, ranked.shape[0])
        _, topk = jax.lax.top_k(ranked, k)
        sc = scores_i[topk] * ctr_i[topk][:, None]
        bb = bbox_i[topk]
        c2 = c2d_i[topk]
        dr = dir_i[topk]
        at = attr_i[topk]
        # back-project centers to 3D
        uvd = jnp.concatenate([c2, bb[:, 2:3]], axis=-1)
        ctr3d = points_img2cam(uvd, c2i)
        # local yaw -> global, dir bins (FCOS3DBBoxCoder.decode_yaw)
        yaw = bb[:, 6]
        dir_rot = limit_period(yaw - cfg.dir_offset, 0, np.pi)
        yaw = dir_rot + cfg.dir_offset + np.pi * dr.astype(yaw.dtype)
        yaw = jnp.arctan2(c2[:, 0] - c2i[0, 2], c2i[0, 0]) + yaw
        boxes_cam = jnp.concatenate(
            [ctr3d, bb[:, 3:6], yaw[:, None]], axis=-1)
        # bottom-center convention: ctr3d is the box center y -> shift
        boxes_cam = boxes_cam.at[:, 1].add(bb[:, 4] / 2)
        boxes_pl = cam_to_pseudo_lidar_boxes(boxes_cam)
        bev = boxes_pl[:, [0, 1, 3, 4, 6]]
        # ride velocity + attr through the NMS gather as extra columns
        extra = [boxes_cam]
        if cfg.pred_velo:
            extra.append(bb[:, 7:9])
        if cfg.pred_attrs:
            extra.append(at[:, None].astype(jnp.float32))
        packed = jnp.concatenate(extra, axis=-1)
        out = box3d_multiclass_nms(packed, bev, sc, cfg.score_thr,
                                   cfg.nms_thr, cfg.max_num)
        sel = out.pop('boxes3d')
        out['boxes3d'] = sel[:, :7]
        col = 7
        if cfg.pred_velo:
            out['velocity'] = sel[:, col:col + 2]
            col += 2
        if cfg.pred_attrs:
            out['attrs'] = sel[:, col].astype(jnp.int32)
        return out

    return jax.vmap(single)(scores, ctr, bbox, dirc, centers2d, attrs,
                            cam2img)
