"""Fixed-shape rotated-BEV NMS and multi-class 3D box post-processing.

TPU-native replacement for the reference's dynamic-shape CUDA path
(`box3d_multiclass_nms` -> mmcv `nms_rotated`,
reference core/post_processing/box3d_nms.py:8-129, 231-271):

* shapes are static: candidates are pre-trimmed to `pre_max_size` by
  top-k and outputs are padded to `post_max_size` with a validity mask;
* greedy suppression runs as a `lax.fori_loop` over the score-sorted
  pairwise rotated-IoU matrix (O(N) steps of O(N) vector work), which
  XLA pipelines well — no host sync, no dynamic allocation.
"""

import jax
import jax.numpy as jnp

from .iou import rotated_iou_bev

__all__ = ['nms_bev', 'box3d_multiclass_nms']


def _greedy_suppress(iou, scores, iou_threshold):
    """Greedy NMS on a pairwise IoU matrix.

    Args:
        iou: (N, N) pairwise IoU.
        scores: (N,) scores (already masked: invalid -> -inf).
        iou_threshold: suppression threshold.

    Returns:
        keep: (N,) bool mask of surviving boxes.
    """
    n = scores.shape[0]
    unroll = 16 if n % 16 == 0 else 1
    order = jnp.argsort(-scores)
    iou_sorted = iou[order][:, order]
    idx = jnp.arange(n)

    def step(i, keep):
        # box i survives iff no earlier kept box overlaps it
        sup = (iou_sorted[:, i] > iou_threshold) & keep & (idx < i)
        return keep.at[i].set(keep[i] & ~jnp.any(sup))

    def body(ib, keep):
        for u in range(unroll):       # static unroll: fewer, fatter
            keep = step(ib * unroll + u, keep)   # loop iterations
        return keep

    # dead candidates (score -inf) sort last and start keep=False, so
    # iterating past the live count is a no-op -> bound the loop by it
    alive = jnp.sum(jnp.isfinite(scores)).astype(jnp.int32)
    n_iter = (alive + unroll - 1) // unroll

    def cond(state):
        ib, _ = state
        return ib < n_iter

    def wbody(state):
        ib, keep = state
        return ib + 1, body(ib, keep)

    _, keep_sorted = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), jnp.isfinite(scores[order])))
    # scatter back to original order
    keep = jnp.zeros_like(keep_sorted).at[order].set(keep_sorted)
    return keep


def nms_bev(boxes_bev, scores, iou_threshold, valid_mask=None):
    """Rotated-BEV NMS over (N, 5) boxes (x, y, dx, dy, yaw).

    Returns a (N,) keep mask (same shape in == out; combine with top-k
    for fixed output sizes). Matches reference `nms_bev` semantics
    (rotated IoU suppression in score order).
    """
    masked_scores = scores
    if valid_mask is not None:
        masked_scores = jnp.where(valid_mask, scores, -jnp.inf)
    iou = rotated_iou_bev(boxes_bev, boxes_bev)
    keep = _greedy_suppress(iou, masked_scores, iou_threshold)
    if valid_mask is not None:
        keep = keep & valid_mask
    return keep


def box3d_multiclass_nms(boxes3d,
                         boxes_for_nms,
                         scores,
                         score_thr,
                         nms_thr,
                         max_num,
                         dir_scores=None,
                         valid_mask=None):
    """Multi-class rotated NMS with static output shapes.

    Args:
        boxes3d: (N, 7) decoded boxes (any frame; passed through).
        boxes_for_nms: (N, 5) BEV boxes used for suppression.
        scores: (N, C) per-class sigmoid scores (no background column).
        score_thr: score threshold.
        nms_thr: rotated-IoU threshold.
        max_num: fixed number of output slots.
        dir_scores: optional (N,) direction scores to gather.
        valid_mask: optional (N,) bool mask of live candidates.

    Returns:
        dict with 'boxes3d' (max_num, 7), 'scores' (max_num,),
        'labels' (max_num,), 'dir_scores' (max_num,) if given, and
        'mask' (max_num,) marking real detections. Invalid slots carry
        zeros / label -1.

    Mirrors reference `box3d_multiclass_nms` (box3d_nms.py:8-129): per-class
    suppression at the same IoU threshold, then global top-`max_num` by
    score — but with one fused IoU matrix and masks instead of per-class
    dynamic tensors.
    """
    num_classes = scores.shape[1]
    n = scores.shape[0]
    base_valid = jnp.ones((n,), bool) if valid_mask is None else valid_mask

    # one shared pairwise IoU matrix for all classes
    iou = rotated_iou_bev(boxes_for_nms, boxes_for_nms)

    def per_class(cls_scores):
        mask = base_valid & (cls_scores > score_thr)
        masked = jnp.where(mask, cls_scores, -jnp.inf)
        keep = _greedy_suppress(iou, masked, nms_thr) & mask
        return keep

    keep_per_class = jax.vmap(per_class, in_axes=1, out_axes=1)(scores)
    # flatten (N, C) candidates
    flat_scores = jnp.where(keep_per_class, scores, -jnp.inf).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat_scores, max_num)
    box_idx = top_idx // num_classes
    labels = top_idx % num_classes
    out_mask = jnp.isfinite(top_scores)
    out = {
        'boxes3d': jnp.where(out_mask[:, None], boxes3d[box_idx], 0.0),
        'scores': jnp.where(out_mask, top_scores, 0.0),
        'labels': jnp.where(out_mask, labels, -1),
        'mask': out_mask,
    }
    if dir_scores is not None:
        out['dir_scores'] = jnp.where(out_mask, dir_scores[box_idx], 0)
    return out
