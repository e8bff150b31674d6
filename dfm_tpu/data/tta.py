"""Test-time augmentation for 3D detection (functional).

Equivalent of the reference's `MultiScaleFlipAug3D`
(datasets/pipelines/test_time_aug.py:119) + `merge_aug_bboxes_3d`
(core/post_processing/merge_augs.py:8-92): run inference on augmented
copies of a sample (horizontal flip / point-cloud scale), map the
detected boxes back to the canonical frame, concatenate and re-run
rotated-BEV NMS per class.

TPU-first shape discipline: every aug variant runs the same jitted
program (the flip is part of the traced meta, scale is a traced
scalar), and the merge works on fixed-size padded detection dicts
(boxes_3d (N, 7), scores_3d (N,), labels_3d (N,), each tail-padded
with score 0).
"""

import numpy as np

__all__ = ['flip_detections_back', 'scale_detections_back',
           'merge_aug_detections']


def flip_detections_back(boxes):
    """Map pseudo-lidar boxes detected on a horizontally-flipped image
    back to the canonical frame: y -> -y, yaw -> -yaw
    (LiDARInstance3DBoxes.flip('horizontal'))."""
    out = np.array(boxes, np.float32, copy=True)
    out[:, 1] = -out[:, 1]
    out[:, 6] = -out[:, 6]
    return out


def scale_detections_back(boxes, pcd_scale_factor):
    """Undo a point-cloud scale aug (bbox3d_mapping_back)."""
    out = np.array(boxes, np.float32, copy=True)
    out[:, :6] /= pcd_scale_factor
    return out


def merge_aug_detections(aug_results, aug_metas, nms_thr=0.25,
                         max_num=100, num_classes=3):
    """Merge per-aug detection dicts.

    Args:
        aug_results: list of dicts with 'boxes_3d' (N, 7) pseudo-lidar,
            'scores_3d' (N,), 'labels_3d' (N,) (padded entries have
            score 0).
        aug_metas: list of dicts with 'flip' (bool) and optional
            'pcd_scale_factor'.

    Returns:
        merged dict of the same layout, NMSed per class (numpy).
    """
    from ..evaluation.kitti_eval import bev_box_overlap

    boxes, scores, labels = [], [], []
    for res, meta in zip(aug_results, aug_metas):
        b = np.asarray(res['boxes_3d'], np.float32).reshape(-1, 7)
        if meta.get('flip', False):
            b = flip_detections_back(b)
        if meta.get('pcd_scale_factor', 1.0) != 1.0:
            b = scale_detections_back(b, meta['pcd_scale_factor'])
        boxes.append(b)
        scores.append(np.asarray(res['scores_3d'], np.float32).ravel())
        labels.append(np.asarray(res['labels_3d']).ravel())
    boxes = np.concatenate(boxes, 0)
    scores = np.concatenate(scores, 0)
    labels = np.concatenate(labels, 0)

    keep_boxes, keep_scores, keep_labels = [], [], []
    for cls in range(num_classes):
        sel = (labels == cls) & (scores > 0)
        if not sel.any():
            continue
        b = boxes[sel]
        s = scores[sel]
        order = np.argsort(-s)
        b, s = b[order], s[order]
        bev = b[:, [0, 1, 3, 4, 6]]
        iou = bev_box_overlap(bev, bev)
        suppressed = np.zeros(len(b), bool)
        for i in range(len(b)):
            if suppressed[i]:
                continue
            suppressed |= (iou[i] > nms_thr) & \
                (np.arange(len(b)) > i)
        keep = ~suppressed
        keep_boxes.append(b[keep])
        keep_scores.append(s[keep])
        keep_labels.append(np.full(keep.sum(), cls, np.int32))
    if keep_boxes:
        boxes = np.concatenate(keep_boxes, 0)
        scores = np.concatenate(keep_scores, 0)
        labels = np.concatenate(keep_labels, 0)
        order = np.argsort(-scores)[:max_num]
        boxes, scores, labels = boxes[order], scores[order], labels[order]
    else:
        boxes = np.zeros((0, 7), np.float32)
        scores = np.zeros((0,), np.float32)
        labels = np.zeros((0,), np.int32)
    return dict(boxes_3d=boxes, scores_3d=scores, labels_3d=labels)
