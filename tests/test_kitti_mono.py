"""KittiMonoDataset + COCO 2D mAP (data/kitti_mono.py)."""

import numpy as np

from dfm_tpu.data.kitti_mono import (KittiMonoDataset, coco_map_2d,
                                     _iou_2d)


def _info():
    return dict(
        image_path='training/image_2/000000.png',
        calib=dict(P2=np.asarray(
            [[700., 0, 600, 40], [0, 700, 180, 2],
             [0, 0, 1, 0.01], [0, 0, 0, 1]], np.float32)),
        annos=dict(
            name=np.asarray(['Car', 'DontCare', 'Pedestrian']),
            bbox=np.asarray([[560, 160, 760, 300],
                             [0, 0, 10, 10],
                             [400, 150, 450, 280]], np.float32),
            location=np.asarray([[1.0, 1.6, 12.0],
                                 [0, 0, 0],
                                 [-3.0, 1.7, 20.0]], np.float32),
            dimensions=np.asarray([[3.9, 1.5, 1.6],
                                   [0, 0, 0],
                                   [0.9, 1.8, 0.6]], np.float32),
            rotation_y=np.asarray([0.2, 0, -0.3], np.float32)))


def test_mono_sample_assembly():
    ds = KittiMonoDataset([_info()])
    s = ds.get_sample(0)
    assert s['gt_mask'].sum() == 2          # DontCare dropped
    assert s['gt_labels'][0] == 0 and s['gt_labels'][1] == 1
    assert s['gt_boxes_cam'][0, 2] == 12.0
    # projected center is inside the 2D box
    cx, cy = s['centers2d'][0]
    x1, y1, x2, y2 = s['gt_bboxes2d'][0]
    assert x1 < cx < x2 and y1 - 40 < cy < y2  # center above bottom

    assert abs(s['gt_depths'][0] - 12.0) < 1e-6


def test_coco_map_perfect_and_degraded():
    gt = [dict(bboxes=np.asarray([[0, 0, 10, 10], [20, 20, 40, 50]]),
               labels=np.asarray([0, 1]))]
    perfect = [dict(bboxes=gt[0]['bboxes'], labels=gt[0]['labels'],
                    scores=np.asarray([0.9, 0.8]))]
    r = coco_map_2d(perfect, gt, num_classes=2)
    assert r['mAP'] > 0.99 and r['mAP_50'] > 0.99

    shifted = [dict(bboxes=np.asarray([[3, 3, 13, 13],
                                       [20, 20, 40, 50]]),
                    labels=np.asarray([0, 1]),
                    scores=np.asarray([0.9, 0.8]))]
    r2 = coco_map_2d(shifted, gt, num_classes=2)
    # box 0 IoU ~0.36: fails every threshold; class 1 still perfect
    assert r2['class0_AP'] == 0.0 and r2['class1_AP'] > 0.99
    assert 0.4 < r2['mAP'] < 0.6


def test_iou2d():
    a = np.asarray([[0, 0, 10, 10]], np.float64)
    b = np.asarray([[5, 0, 15, 10], [20, 20, 30, 30]], np.float64)
    iou = _iou_2d(a, b)
    assert abs(iou[0, 0] - 1 / 3) < 1e-6 and iou[0, 1] == 0.0
