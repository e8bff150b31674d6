"""Point-cloud semantic segmentation metrics (mIoU / acc / per-class).

Equivalent of the reference's `seg_eval`
(mmdet3d/core/evaluation/seg_eval.py:70-131): per-sample confusion
matrices accumulated over the dataset, per-class IoU from the summed
matrix, overall accuracy and class-averaged accuracy. Pure numpy —
runs on host over already-gathered per-point label arrays.
"""

import numpy as np

__all__ = ['fast_hist', 'per_class_iou', 'seg_eval']


def fast_hist(preds, labels, num_classes):
    """Confusion matrix of one sample; rows = gt, cols = pred.

    Labels outside [0, num_classes) are dropped (the ignore mechanism:
    callers remap ignored points to -1 first).
    """
    preds = np.asarray(preds).astype(np.int64).reshape(-1)
    labels = np.asarray(labels).astype(np.int64).reshape(-1)
    k = (labels >= 0) & (labels < num_classes)
    return np.bincount(
        num_classes * labels[k] + preds[k],
        minlength=num_classes ** 2)[:num_classes ** 2].reshape(
            num_classes, num_classes)


def per_class_iou(hist):
    """Diagonal over (row sum + col sum - diagonal); NaN when a class
    never appears."""
    with np.errstate(divide='ignore', invalid='ignore'):
        return np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))


def seg_eval(gt_labels, seg_preds, label2cat, ignore_index=None):
    """Evaluate semantic segmentation over a list of samples.

    Args:
        gt_labels: list of (N_i,) int arrays of ground-truth labels.
        seg_preds: list of (N_i,) int arrays of predicted labels.
        label2cat: dict {label int -> class name}.
        ignore_index: label value excluded from both gt and pred.

    Returns:
        dict {class name -> IoU} + 'miou', 'acc', 'acc_cls'.
    """
    assert len(seg_preds) == len(gt_labels)
    num_classes = len(label2cat)
    hist = np.zeros((num_classes, num_classes), np.int64)
    for gt, pred in zip(gt_labels, seg_preds):
        gt = np.asarray(gt).copy().reshape(-1)
        pred = np.asarray(pred).copy().reshape(-1)
        if ignore_index is not None:
            pred = np.where(gt == ignore_index, -1, pred)
            gt = np.where(gt == ignore_index, -1, gt)
        hist += fast_hist(pred, gt, num_classes)

    iou = per_class_iou(hist)
    ret = {str(label2cat[i]): float(iou[i]) for i in range(num_classes)}
    ret['miou'] = float(np.nanmean(iou))
    total = hist.sum()
    ret['acc'] = float(np.diag(hist).sum() / total) if total else 0.0
    with np.errstate(divide='ignore', invalid='ignore'):
        ret['acc_cls'] = float(np.nanmean(np.diag(hist) / hist.sum(axis=1)))
    return ret
