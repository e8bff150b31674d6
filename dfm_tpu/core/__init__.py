from . import anchors, boxes, coders, iou, losses, nms, targets, transforms

__all__ = ['anchors', 'boxes', 'coders', 'iou', 'losses', 'nms', 'targets',
           'transforms']
