"""Anchor target assignment, static-shape (padded GT + masks).

TPU-native equivalent of the reference's `AnchorTrainMixin.anchor_target_3d`
+ mmdet `MaxIoUAssigner` (reference mmdet3d/models/dense_heads/
train_mixins.py:12-319): instead of dynamic-length index tensors and
per-sample python loops, ground truths are padded to a fixed `max_gt` and
every rule is a vectorized select, so the whole assignment jits and vmaps
over the batch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .coders import delta_xyzwlhr_encode
from .iou import nearest_bev_iou
from .transforms import limit_period

__all__ = ['max_iou_assign', 'anchor_targets_single_class',
           'get_direction_target', 'add_sin_difference']


def max_iou_assign(overlaps,
                   gt_mask,
                   pos_iou_thr,
                   neg_iou_thr,
                   min_pos_iou=0.0,
                   gt_max_assign_all=True):
    """MaxIoU assignment.

    Args:
        overlaps: (G, A) IoU between (padded) gts and anchors.
        gt_mask: (G,) bool validity of each gt row.
        pos_iou_thr / neg_iou_thr / min_pos_iou: scalars.

    Returns:
        assigned: (A,) int32; -1 = ignore, 0 = negative, g+1 = matched
        to gt g. Matches mmdet MaxIoUAssigner.assign_wrt_overlaps,
        including the "each gt claims its best anchors" rule (later gts
        overwrite earlier ones, as in the reference's sequential loop).
    """
    neg_inf = jnp.asarray(-1.0, overlaps.dtype)
    overlaps = jnp.where(gt_mask[:, None], overlaps, neg_inf)
    max_overlaps = jnp.max(overlaps, axis=0)            # (A,)
    argmax_overlaps = jnp.argmax(overlaps, axis=0)      # (A,)

    assigned = jnp.full(overlaps.shape[1], -1, jnp.int32)
    # negatives; with zero valid gts every anchor is a negative (mmdet
    # assign_wrt_overlaps: num_gts == 0 -> assigned_gt_inds all 0), so
    # class-empty frames still train the classifier on background
    no_gt = ~gt_mask.any()
    assigned = jnp.where(
        no_gt | ((max_overlaps >= 0) & (max_overlaps < neg_iou_thr)),
        0, assigned)
    # positives
    assigned = jnp.where(
        max_overlaps >= pos_iou_thr,
        argmax_overlaps.astype(jnp.int32) + 1, assigned)
    if gt_max_assign_all:
        gt_max = jnp.max(overlaps, axis=1)              # (G,)
        claim = (overlaps == gt_max[:, None]) & \
            (gt_max >= min_pos_iou)[:, None] & gt_mask[:, None]
        # later gts overwrite earlier: take the max claiming index
        gt_ids = jnp.arange(overlaps.shape[0], dtype=jnp.int32) + 1
        claimed = jnp.max(
            jnp.where(claim, gt_ids[:, None], 0), axis=0)  # (A,)
        assigned = jnp.where(claimed > 0, claimed, assigned)
    return assigned


def get_direction_target(anchors_yaw, reg_targets_yaw, dir_offset=0.7854,
                         num_bins=2):
    """Direction-bin classification targets
    (reference train_mixins.py `get_direction_target`)."""
    rot_gt = reg_targets_yaw + anchors_yaw
    offset_rot = limit_period(rot_gt - dir_offset, 0, 2 * np.pi)
    dir_cls = jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32)
    return jnp.clip(dir_cls, 0, num_bins - 1)


def add_sin_difference(boxes1, boxes2):
    """Replace the yaw channel by sin(r1)cos(r2) / cos(r1)sin(r2)
    (reference anchor3d_head.py `add_sin_difference`)."""
    rad1 = jnp.sin(boxes1[..., 6:7]) * jnp.cos(boxes2[..., 6:7])
    rad2 = jnp.cos(boxes1[..., 6:7]) * jnp.sin(boxes2[..., 6:7])
    b1 = jnp.concatenate([boxes1[..., :6], rad1, boxes1[..., 7:]], axis=-1)
    b2 = jnp.concatenate([boxes2[..., :6], rad2, boxes2[..., 7:]], axis=-1)
    return b1, b2


def anchor_targets_single_class(anchors,
                                gt_boxes,
                                gt_mask,
                                pos_iou_thr,
                                neg_iou_thr,
                                min_pos_iou,
                                class_id,
                                num_classes,
                                dir_offset=0.7854):
    """Targets for one class's anchors against that class's gts.

    Args:
        anchors: (A, 7) anchors of this class (flattened grid).
        gt_boxes: (G, 7) padded gt boxes (same frame as anchors).
        gt_mask: (G,) validity (False rows are ignored).
        class_id: label to give positives.

    Returns:
        dict of labels (A,) int32 in [0..num_classes] (num_classes = bg),
        label_weights (A,), bbox_targets (A, 7), bbox_weights (A,),
        dir_targets (A,) int32, dir_weights (A,), pos_mask (A,) bool.
    """
    overlaps = nearest_bev_iou(gt_boxes, anchors)       # (G, A)
    assigned = max_iou_assign(overlaps, gt_mask, pos_iou_thr, neg_iou_thr,
                              min_pos_iou)
    pos = assigned > 0
    neg = assigned == 0
    gt_idx = jnp.maximum(assigned - 1, 0)
    # substitute the anchor itself for non-positives *before* encoding:
    # padded gts are all-zero and log(0/wa) would poison gradients even
    # through a masking `where` (NaN * 0 = NaN in the backward pass)
    matched_gt = jnp.where(
        pos[:, None], gt_boxes[gt_idx], anchors)        # (A, 7)

    labels = jnp.where(pos, class_id, num_classes).astype(jnp.int32)
    label_weights = (pos | neg).astype(jnp.float32)
    bbox_targets = jnp.where(
        pos[:, None], delta_xyzwlhr_encode(anchors, matched_gt), 0.0)
    bbox_weights = pos.astype(jnp.float32)
    dir_targets = jnp.where(
        pos,
        get_direction_target(anchors[..., 6], bbox_targets[..., 6],
                             dir_offset), 0).astype(jnp.int32)
    dir_weights = pos.astype(jnp.float32)
    return dict(labels=labels, label_weights=label_weights,
                bbox_targets=bbox_targets, bbox_weights=bbox_weights,
                dir_targets=dir_targets, dir_weights=dir_weights,
                pos_mask=pos)


def iou_neg_piecewise_sample(assigned, max_overlaps, rng,
                             num_expected_neg=512,
                             neg_piece_fractions=(0.8, 0.2),
                             neg_iou_piece_thrs=(0.55, 0.1),
                             return_iou_weight=False):
    """IoUNegPiecewiseSampler (reference core/bbox/samplers/
    iou_neg_piecewise_sampler.py, used by PartA2/point heads): sample
    negatives from IoU bands with fixed per-band budgets — hard
    negatives (just under the positive threshold) get most of the
    budget. Static shape: returns a (N,) weight in {0, 1} with at most
    `num_expected_neg` negatives enabled.

    Args:
        assigned: (N,) assignment from `max_iou_assign` (-1 = negative).
        max_overlaps: (N,) best-gt IoU per anchor.
        rng: PRNGKey.
        neg_piece_fractions: budget split per IoU band; bands are
            [thr_{i+1}, thr_i) descending from neg_iou_piece_thrs.
    """
    neg = assigned == -1
    n = assigned.shape[0]
    weight = jnp.zeros((n,), jnp.float32)
    hi = jnp.asarray(neg_iou_piece_thrs)
    lo = jnp.concatenate([hi[1:], jnp.zeros((1,))])
    keys = jax.random.split(rng, len(neg_iou_piece_thrs))
    for i, frac in enumerate(neg_piece_fractions):
        budget = int(round(num_expected_neg * frac))
        band = neg & (max_overlaps < hi[i]) & (max_overlaps >= lo[i])
        # random top-k selection inside the band (static shape)
        score = jnp.where(band, jax.random.uniform(keys[i], (n,)), -1.0)
        _, idx = jax.lax.top_k(score, budget)
        ok = score[idx] > 0
        weight = weight.at[idx].max(ok.astype(jnp.float32))
    return weight
