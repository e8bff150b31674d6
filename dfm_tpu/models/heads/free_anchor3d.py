"""FreeAnchor 3D loss: detection-customized likelihood over anchor bags.

Equivalent of the reference's `FreeAnchor3DHead.loss`
(mmdet3d/models/dense_heads/free_anchor3d_head.py:49-285): the forward
tower is the plain `Anchor3DHead` (reuse `LIGAAnchor3DHead` with
num_convs=0); training replaces MaxIoU assignment with the FreeAnchor
bag formulation — each GT owns a bag of its `pre_anchor_topk` highest-
IoU anchors and pays a mean-max positive likelihood over the bag, while
every anchor pays a focal negative loss weighted by how unlikely it is
to be matched to any object (`P{a_j in A+}`).

Static-shape port: GTs are capacity-padded with a validity mask; the
reference's sparse max over (object, class) pairs becomes a per-class
masked max (num_classes is small); bags of invalid GTs are masked out
of both the positive sum and the `num_pos` normalizer. All math in
f32.
"""

import jax
import jax.numpy as jnp

from ...core.coders import delta_xyzwlhr_decode, delta_xyzwlhr_encode
from ...core.iou import nearest_bev_iou
from ...core.targets import add_sin_difference, get_direction_target

__all__ = ['free_anchor3d_loss']


def _smooth_l1(pred, target, beta):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def free_anchor3d_loss(preds,
                       flat_anchors,
                       gt_boxes,
                       gt_labels,
                       gt_mask,
                       num_classes=3,
                       pre_anchor_topk=50,
                       bbox_thr=0.6,
                       gamma=2.0,
                       alpha=0.5,
                       dir_offset=0.7854,
                       beta=1.0 / 9.0,
                       bbox_loss_weight=2.0,
                       dir_loss_weight=0.2):
    """FreeAnchor positive/negative bag losses.

    Args:
        preds: (cls_score, bbox_pred, dir_pred), each (B, Ny, Nx, A*X).
        flat_anchors: (J, 7), J = Ny*Nx*A, matching the channel order.
        gt_boxes: (B, G, 7) padded; gt_labels (B, G); gt_mask (B, G).

    Returns:
        {'positive_bag_loss', 'negative_bag_loss'} scalars.
    """
    cls_score, bbox_pred, dir_pred = preds
    b = cls_score.shape[0]
    j = flat_anchors.shape[0]
    cls_score = cls_score.astype(jnp.float32).reshape(b, j, num_classes)
    bbox_pred = bbox_pred.astype(jnp.float32).reshape(b, j, 7)
    has_dir = dir_pred is not None          # static: hoisted out of the
    dir_pred = dir_pred.astype(jnp.float32).reshape(b, j, 2) \
        if has_dir else None                # traced fn (a zeros stand-in
    # is substituted for vmap below, so `dir_i is not None` would
    # always be True inside and add a constant log(2) dir term)

    def single(scores_i, deltas_i, dir_i, gtb, gtl, gtm):
        cls_prob = jax.nn.sigmoid(scores_i)                     # (J, C)
        pred_boxes = delta_xyzwlhr_decode(flat_anchors, deltas_i)

        # P{a_j -> b_i}: saturated-linear IoU, stop-gradient like the
        # reference's no_grad block
        iou = jax.lax.stop_gradient(
            nearest_bev_iou(gtb, pred_boxes))                   # (G, J)
        iou = jnp.where(gtm[:, None], iou, 0.0)
        t1 = bbox_thr
        t2 = jnp.maximum(iou.max(axis=1, keepdims=True), t1 + 1e-6)
        obj_box_prob = jnp.clip((iou - t1) / (t2 - t1), 0.0, 1.0)

        # image_box_prob[j, c] = max over GTs of class c (dense
        # replacement of the reference's sparse_coo max)
        per_class = []
        for c in range(num_classes):
            sel = (gtl == c) & gtm
            per_class.append(
                jnp.where(sel[:, None], obj_box_prob, 0.0).max(axis=0))
        image_box_prob = jnp.stack(per_class, axis=-1)          # (J, C)

        # bags: top-k anchors per GT by anchor IoU
        mq = nearest_bev_iou(gtb, flat_anchors)                 # (G, J)
        mq = jnp.where(gtm[:, None], mq, -1.0)
        _, matched = jax.lax.top_k(mq, pre_anchor_topk)         # (G, K)

        gtl_safe = jnp.clip(gtl, 0, num_classes - 1)
        matched_cls_prob = jnp.take_along_axis(
            cls_prob[matched],                                  # (G, K, C)
            gtl_safe[:, None, None], axis=-1)[..., 0]           # (G, K)

        matched_anchors = flat_anchors[matched]                 # (G, K, 7)
        # padded GTs are all-zero boxes whose encode emits -inf
        # (log(0/wa)); substitute the anchor itself BEFORE encoding
        # (zero target, finite forward and backward)
        matched_gt = jnp.where(
            gtm[:, None, None],
            gtb[:, None, :] + jnp.zeros_like(matched_anchors),
            matched_anchors)
        targets = delta_xyzwlhr_encode(matched_anchors, matched_gt)
        matched_deltas = deltas_i[matched]                      # (G, K, 7)

        loss_dir = 0.0
        if has_dir:
            dir_t = get_direction_target(
                matched_anchors[..., 6], targets[..., 6], dir_offset)
            logp = jax.nn.log_softmax(dir_i[matched], axis=-1)
            loss_dir = -dir_loss_weight * jnp.take_along_axis(
                logp, dir_t[..., None], axis=-1)[..., 0]        # (G, K)

        p_sin, t_sin = add_sin_difference(matched_deltas, targets)
        loss_bbox = bbox_loss_weight * _smooth_l1(
            p_sin, t_sin, beta).sum(axis=-1)                    # (G, K)
        matched_box_prob = jnp.exp(-(loss_bbox + loss_dir))

        # positive bag: mean-max likelihood
        p = matched_cls_prob * matched_box_prob
        w = 1.0 / jnp.clip(1.0 - p, 1e-12, None)
        w = w / w.sum(axis=1, keepdims=True)
        bag_prob = jnp.clip((w * p).sum(axis=1), 1e-12, 1.0)
        pos = -alpha * jnp.log(bag_prob) * gtm                  # (G,)

        # negative: focal on P(cls) * (1 - P{a in A+})
        neg_prob = jnp.clip(cls_prob * (1.0 - image_box_prob), 0.0,
                            1.0 - 1e-12)
        neg = (1 - alpha) * (neg_prob ** gamma) * \
            (-jnp.log1p(-neg_prob))
        return pos.sum(), neg.sum(), gtm.sum()

    pos, neg, npos = jax.vmap(single)(
        cls_score, bbox_pred,
        dir_pred if dir_pred is not None else jnp.zeros((b, j, 2)),
        gt_boxes.astype(jnp.float32), gt_labels, gt_mask)
    num_pos = jnp.maximum(npos.sum(), 1.0)
    return {
        'positive_bag_loss': pos.sum() / num_pos,
        'negative_bag_loss': neg.sum() / (num_pos * pre_anchor_topk),
    }
