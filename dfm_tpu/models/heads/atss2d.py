"""2D auxiliary ATSS head for DfM (flax + functional).

Equivalent of the reference's `LIGAATSSHead` (mmdet3d/models/dense_heads/
liga_atss_head.py, extending mmdet ATSSHead) with the
`ATSS3DCenterAssigner` behavior (core/bbox/assigners/
atss_3dcenter_assigner.py): the auxiliary 2D detection loss on the
semantic features (reference dfm.py:330-347), where each gt's "center"
for candidate selection is the projected 3D center appended to the 2D
box (append_3d_centers).

Static-shape ATSS assignment: per (gt, level) the top-k anchors by
center distance are selected with a fixed k, the IoU threshold is
mean+std over the fixed candidate set, and all rules are masked selects.
"""

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import losses as L
from ...core.iou import aligned_iou_2d

INF = 1e8


@dataclasses.dataclass(frozen=True)
class ATSS2DConfig:
    num_classes: int = 3
    in_channels: int = 64
    feat_channels: int = 64
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    anchor_scale: float = 16.0    # octave_base_scale, ratio 1.0
    topk: int = 9
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)


class ATSS2DHead(nn.Module):
    cfg: ATSS2DConfig = dataclasses.field(default_factory=ATSS2DConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cfg = self.cfg
        from ..layers import ConvNorm
        cls_tower = [ConvNorm(cfg.feat_channels, (3, 3), norm='gn',
                              dtype=self.dtype, name=f'cls_tower{i}')
                     for i in range(cfg.stacked_convs)]
        reg_tower = [ConvNorm(cfg.feat_channels, (3, 3), norm='gn',
                              dtype=self.dtype, name=f'reg_tower{i}')
                     for i in range(cfg.stacked_convs)]
        conv_cls = nn.Conv(cfg.num_classes, (3, 3),
                           padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           name='atss_cls')
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name='atss_reg')
        conv_ctr = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name='atss_centerness')
        outs = []
        for x in feats:
            c = x
            r = x
            for m in cls_tower:
                c = m(c, train)
            for m in reg_tower:
                r = m(r, train)
            outs.append(dict(cls_score=conv_cls(c),
                             bbox_pred=conv_reg(r),
                             centerness=conv_ctr(r)))
        return outs


def level_anchors(featmap_size, stride, scale):
    """(H*W, 4) square anchors centered on the grid (ratio 1)."""
    h, w = featmap_size
    ys = (np.arange(h, dtype=np.float32) + 0.5) * stride
    xs = (np.arange(w, dtype=np.float32) + 0.5) * stride
    yy, xx = np.meshgrid(ys, xs, indexing='ij')
    half = scale * stride / 2
    return np.stack([xx - half, yy - half, xx + half, yy + half],
                    -1).reshape(-1, 4)


def atss_assign(anchors_np, level_sizes, gt_boxes, gt_centers, gt_mask,
                topk=9):
    """ATSS assignment (static shapes).

    Args:
        anchors_np: (A, 4) concatenated anchors.
        level_sizes: list of per-level anchor counts.
        gt_boxes: (G, 4) xyxy; gt_centers: (G, 2) (projected 3D centers);
        gt_mask: (G,).

    Returns:
        assigned: (A,) int32; -1 none, g = matched gt.
    """
    anchors = jnp.asarray(anchors_np)
    a_ctr = (anchors[:, :2] + anchors[:, 2:]) / 2
    g = gt_boxes.shape[0]
    ious = aligned_iou_2d(anchors, gt_boxes)           # (A, G)
    dist = jnp.linalg.norm(
        a_ctr[:, None] - gt_centers[None], axis=-1)    # (A, G)

    # per-level top-k candidates by distance
    cand_masks = []
    start = 0
    for n in level_sizes:
        d_l = dist[start:start + n]
        k = min(topk, n)
        idx = jnp.argsort(d_l, axis=0)[:k]             # (k, G)
        m = jnp.zeros((n, g), bool).at[
            idx, jnp.arange(g)[None, :]].set(True)
        cand_masks.append(m)
        start += n
    cand = jnp.concatenate(cand_masks, axis=0)         # (A, G)

    cand_ious = jnp.where(cand, ious, jnp.nan)
    mean = jnp.nanmean(cand_ious, axis=0)
    std = jnp.sqrt(jnp.nanmean((cand_ious - mean[None])**2, axis=0))
    thr = mean + std                                    # (G,)

    inside = ((a_ctr[:, None, 0] > gt_boxes[None, :, 0]) &
              (a_ctr[:, None, 0] < gt_boxes[None, :, 2]) &
              (a_ctr[:, None, 1] > gt_boxes[None, :, 1]) &
              (a_ctr[:, None, 1] < gt_boxes[None, :, 3]))
    pos = cand & (ious >= thr[None]) & inside & gt_mask[None]
    # each anchor takes the gt with max IoU among its positives
    best = jnp.argmax(jnp.where(pos, ious, -1.0), axis=1)
    assigned = jnp.where(pos.any(axis=1), best, -1)
    return assigned.astype(jnp.int32), ious


def atss2d_loss(level_outs, img_hw, batch, cfg: ATSS2DConfig,
                axis_name=None):
    """Focal cls + GIoU box + BCE centerness (mmdet ATSSHead.loss
    semantics), static shapes.

    batch: 'gt_bboxes2d' (B,G,4), 'centers2d' (B,G,2),
        'gt_labels' (B,G), 'gt_mask' (B,G).
    """
    h, w = img_hw
    sizes = [((h + s - 1) // s, (w + s - 1) // s) for s in cfg.strides]
    anchors_np = np.concatenate([
        level_anchors(sz, s, cfg.anchor_scale)
        for sz, s in zip(sizes, cfg.strides)], 0)
    level_sizes = [sz[0] * sz[1] for sz in sizes]
    anchors = jnp.asarray(anchors_np)

    def flat(key, per):
        return jnp.concatenate([
            o[key].astype(jnp.float32).reshape(o[key].shape[0], -1, per)
            for o in level_outs], axis=1)

    cls_score = flat('cls_score', cfg.num_classes)
    bbox_pred = flat('bbox_pred', 4)
    centerness = flat('centerness', 1)[..., 0]

    def single(gt2d, c2d, gl, gm):
        assigned, _ = atss_assign(anchors_np, level_sizes, gt2d, c2d, gm,
                                  cfg.topk)
        pos = assigned >= 0
        gi = jnp.maximum(assigned, 0)
        labels = jnp.where(pos, gl[gi], cfg.num_classes)
        matched = gt2d[gi]
        return labels.astype(jnp.int32), matched, pos

    labels, matched, pos = jax.vmap(single)(
        batch['gt_bboxes2d'], batch['centers2d'], batch['gt_labels'],
        batch['gt_mask'])

    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)

    loss_cls = L.sigmoid_focal_loss(cls_score, labels, avg_factor=num_pos)

    # decode DeltaXYWH predictions on anchors
    stds = jnp.asarray(cfg.target_stds)
    wa = anchors[:, 2] - anchors[:, 0]
    ha = anchors[:, 3] - anchors[:, 1]
    xa = (anchors[:, 0] + anchors[:, 2]) / 2
    ya = (anchors[:, 1] + anchors[:, 3]) / 2
    d = bbox_pred * stds[None, None]
    xg = xa[None] + d[..., 0] * wa[None]
    yg = ya[None] + d[..., 1] * ha[None]
    wg = wa[None] * jnp.exp(jnp.clip(d[..., 2], -10, 10))
    hg = ha[None] * jnp.exp(jnp.clip(d[..., 3], -10, 10))
    decoded = jnp.stack([xg - wg / 2, yg - hg / 2, xg + wg / 2,
                         yg + hg / 2], axis=-1)
    wmask = pos.astype(jnp.float32)
    matched_s = jnp.where(pos[..., None], matched, 0.0)
    decoded_s = jnp.where(pos[..., None], decoded, 0.0)
    loss_bbox = L.giou_loss_2d(decoded_s, matched_s, wmask,
                               avg_factor=num_pos) * 2.0

    # centerness targets from l/r/t/b wrt matched boxes
    acx = (anchors[:, 0] + anchors[:, 2])[None] / 2
    acy = (anchors[:, 1] + anchors[:, 3])[None] / 2
    lr = jnp.stack([acx - matched[..., 0], matched[..., 2] - acx], -1)
    tb = jnp.stack([acy - matched[..., 1], matched[..., 3] - acy], -1)
    lr = jnp.maximum(lr, 1e-3)
    tb = jnp.maximum(tb, 1e-3)
    ctr_tgt = jnp.sqrt((lr.min(-1) / lr.max(-1)) *
                       (tb.min(-1) / tb.max(-1)))
    loss_ctr = L.binary_cross_entropy(centerness, ctr_tgt, wmask,
                                      avg_factor=num_pos)
    return dict(loss_cls2d=loss_cls, loss_bbox2d=loss_bbox,
                loss_centerness2d=loss_ctr)


def atss2d_decode(level_outs, img_hw, cfg: ATSS2DConfig, max_boxes=16):
    """Decode ATSS level outputs to (B, max_boxes, 6) static slots
    `(l, t, r, b, conf, cls)` — the vote-fusion input format. Top-k
    over sigmoid(cls) * sigmoid(centerness) (mmdet ATSSHead
    .get_bboxes semantics without per-class NMS — the fusion consumer
    max-pools cues per seed, so duplicates are harmless)."""
    h, w = img_hw
    sizes = [((h + s - 1) // s, (w + s - 1) // s) for s in cfg.strides]
    anchors = jnp.asarray(np.concatenate([
        level_anchors(sz, s, cfg.anchor_scale)
        for sz, s in zip(sizes, cfg.strides)], 0))

    def flat(key, per):
        return jnp.concatenate([
            o[key].astype(jnp.float32).reshape(o[key].shape[0], -1, per)
            for o in level_outs], axis=1)

    cls = jax.nn.sigmoid(flat('cls_score', cfg.num_classes))
    ctr = jax.nn.sigmoid(flat('centerness', 1))
    score = cls * ctr                                # (B, A, C)
    conf = score.max(-1)
    label = jnp.argmax(score, -1)

    stds = jnp.asarray(cfg.target_stds)
    d = flat('bbox_pred', 4) * stds[None, None]
    wa = anchors[:, 2] - anchors[:, 0]
    ha = anchors[:, 3] - anchors[:, 1]
    xa = (anchors[:, 0] + anchors[:, 2]) / 2
    ya = (anchors[:, 1] + anchors[:, 3]) / 2
    xg = xa[None] + d[..., 0] * wa[None]
    yg = ya[None] + d[..., 1] * ha[None]
    wg = wa[None] * jnp.exp(jnp.clip(d[..., 2], -10, 10))
    hg = ha[None] * jnp.exp(jnp.clip(d[..., 3], -10, 10))
    boxes = jnp.stack([
        jnp.clip(xg - wg / 2, 0, w - 1), jnp.clip(yg - hg / 2, 0, h - 1),
        jnp.clip(xg + wg / 2, 0, w - 1), jnp.clip(yg + hg / 2, 0, h - 1)],
        -1)

    top_conf, idx = jax.lax.top_k(conf, max_boxes)
    top_boxes = jnp.take_along_axis(boxes, idx[..., None], 1)
    top_label = jnp.take_along_axis(label, idx, 1)
    return jnp.concatenate(
        [top_boxes, top_conf[..., None],
         top_label[..., None].astype(jnp.float32)], -1)
