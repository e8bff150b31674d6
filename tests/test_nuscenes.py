"""nuScenes dataset + hermetic detection metrics (data/nuscenes.py)."""

import os
import pickle

import numpy as np

from dfm_tpu.data.nuscenes import (NUS_CLASSES, NuScenesMonoDataset,
                                   nuscenes_detection_metrics)


def _gt(boxes, labels, attrs=None):
    d = dict(boxes=np.asarray(boxes, np.float64),
             labels=np.asarray(labels))
    if attrs is not None:
        d['attrs'] = np.asarray(attrs)
    return d


def _pred(boxes, labels, scores, attrs=None):
    d = _gt(boxes, labels, attrs)
    d['scores'] = np.asarray(scores, np.float64)
    return d


def test_perfect_predictions_score_one():
    boxes = [[0, 0, 0, 2, 4, 1.5, 0.3, 1, 0],
             [10, 5, 0, 0.6, 0.8, 1.7, -0.4, 0, 0]]
    gts = [_gt(boxes, [0, 7], [6, 2])]
    preds = [_pred(boxes, [0, 7], [0.9, 0.8], [6, 2])]
    r = nuscenes_detection_metrics(preds, gts)
    assert r['car_AP'] > 0.99 and r['pedestrian_AP'] > 0.99
    assert abs(r['mTRANS_ERR']) < 1e-9
    assert r['NDS'] > 0.5      # mAP only 2/10 classes populated

    # per-class AP of absent classes is 0 (devkit treats as 0 in mAP)
    assert r['truck_AP'] == 0.0


def test_shifted_predictions_degrade():
    gt_boxes = [[0, 0, 0, 2, 4, 1.5, 0.0, 0, 0]]
    gts = [_gt(gt_boxes, [0])]
    close = [_pred([[0.4, 0, 0, 2, 4, 1.5, 0.0, 0, 0]], [0], [0.9])]
    far = [_pred([[6.0, 0, 0, 2, 4, 1.5, 0.0, 0, 0]], [0], [0.9])]
    r_close = nuscenes_detection_metrics(close, gts)
    r_far = nuscenes_detection_metrics(far, gts)
    assert r_close['car_AP'] > r_far['car_AP']
    assert r_far['car_AP'] == 0.0     # outside every threshold
    # 0.4 m shift: misses the 0.5m? no — within 0.5 -> all 4 thresholds
    assert r_close['car_AP'] > 0.99
    assert 0.35 < r_close['mTRANS_ERR'] < 0.45


def test_orientation_and_attr_errors():
    gts = [_gt([[0, 0, 0, 2, 4, 1.5, 0.0, 0, 0]], [0], [5])]
    preds = [_pred([[0, 0, 0, 2, 4, 1.5, np.pi / 2, 0, 0]], [0],
                   [0.9], [6])]
    r = nuscenes_detection_metrics(preds, gts)
    assert abs(r['mORIENT_ERR'] - np.pi / 2) < 1e-6
    assert r['mATTR_ERR'] == 1.0


def test_dataset_loading(tmp_path):
    infos = [dict(token='t0', img_path='img0.png',
                  cam2img=np.eye(4), width=64, height=32,
                  gt_boxes=np.asarray([[1, 2, 0, 2, 4, 1.5, 0.1, 0, 0]]),
                  gt_names=['car'], gt_attrs=np.asarray([6]))]
    with open(tmp_path / 'nuscenes_infos_mono.pkl', 'wb') as f:
        pickle.dump(infos, f)
    import cv2
    cv2.imwrite(str(tmp_path / 'img0.png'),
                np.zeros((32, 64, 3), np.uint8))
    ds = NuScenesMonoDataset(str(tmp_path))
    assert len(ds) == 1
    s = ds.get_sample(0)
    assert s['img'].shape == (32, 64, 3)
    assert s['gt_mask'].sum() == 1
    assert s['gt_labels'][0] == NUS_CLASSES.index('car')
    assert s['gt_attrs'][0] == 6
