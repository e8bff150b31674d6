"""Indoor datasets (SUN RGB-D / ScanNet) + indoor_eval."""

import os

import numpy as np
import pytest

from dfm_tpu.evaluation.indoor_eval import (average_precision,
                                            depth_box3d_overlap,
                                            indoor_eval)

REF = '/root/reference/tests/data'


def _box(x, y, z, dx=1.0, dy=1.0, dz=1.0, yaw=0.0):
    return np.array([x, y, z, dx, dy, dz, yaw], np.float32)


def test_depth_box3d_overlap_identity_and_disjoint():
    a = np.stack([_box(0, 0, 0), _box(5, 5, 0)])
    iou = depth_box3d_overlap(a, a)
    assert np.allclose(np.diag(iou), 1.0, atol=1e-6)
    assert iou[0, 1] < 1e-9
    # half z overlap, same footprint
    b = np.stack([_box(0, 0, 0.5)])
    assert abs(depth_box3d_overlap(a[:1], b)[0, 0] - 1 / 3) < 1e-6
    # rotation by 90 deg of a square box = identity
    c = np.stack([_box(0, 0, 0, yaw=np.pi / 2)])
    assert abs(depth_box3d_overlap(a[:1], c)[0, 0] - 1.0) < 1e-5


def test_average_precision_area():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(average_precision(rec, prec)[0] - 1.0) < 1e-6
    prec = np.array([1.0, 0.5])
    ap = average_precision(rec, prec)[0]
    assert 0.5 < ap < 1.0


def _gt_dt(perfect=True):
    gts = [dict(gt_boxes=np.stack([_box(0, 0, 0), _box(3, 0, 0)]),
                gt_labels=np.array([0, 1])),
           dict(gt_boxes=np.stack([_box(1, 1, 0)]),
                gt_labels=np.array([0]))]
    shift = 0.0 if perfect else 2.5
    dts = [dict(boxes3d=np.stack([_box(0 + shift, 0, 0), _box(3, 0, 0)]),
                scores=np.array([0.9, 0.8], np.float32),
                labels=np.array([0, 1])),
           dict(boxes3d=np.stack([_box(1 + shift, 1, 0)]),
                scores=np.array([0.7], np.float32),
                labels=np.array([0]))]
    return gts, dts


def test_indoor_eval_perfect_and_shifted():
    label2cat = {0: 'chair', 1: 'table'}
    gts, dts = _gt_dt(perfect=True)
    r = indoor_eval(gts, dts, (0.25, 0.5), label2cat)
    assert r['mAP_0.25'] == pytest.approx(1.0)
    assert r['mAP_0.50'] == pytest.approx(1.0)
    gts, dts = _gt_dt(perfect=False)
    r = indoor_eval(gts, dts, (0.25,), label2cat)
    assert r['chair_AP_0.25'] == 0.0
    assert r['table_AP_0.25'] == pytest.approx(1.0)


def test_indoor_eval_duplicate_is_fp():
    gts = [dict(gt_boxes=_box(0, 0, 0)[None], gt_labels=np.array([0]))]
    dts = [dict(boxes3d=np.stack([_box(0, 0, 0), _box(0.05, 0, 0)]),
                scores=np.array([0.9, 0.8], np.float32),
                labels=np.array([0, 0]))]
    r = indoor_eval(gts, dts, (0.25,), {0: 'c'})
    # 1 TP + 1 FP on 1 GT: recall hits 1 at rank 1 -> area AP still 1,
    # but the duplicate must not double-count recall
    assert r['c_AP_0.25'] == pytest.approx(1.0)
    assert r['c_rec_0.25'] == pytest.approx(1.0)
    # two GTs, duplicate ranked between the true matches: the exact
    # area-AP value (0.8333) pins first-match-wins + duplicate-is-FP
    gts = [dict(gt_boxes=np.stack([_box(0, 0, 0), _box(5, 0, 0)]),
                gt_labels=np.array([0, 0]))]
    dts = [dict(boxes3d=np.stack([_box(0, 0, 0), _box(0.05, 0, 0),
                                  _box(5, 0, 0)]),
                scores=np.array([0.9, 0.8, 0.7], np.float32),
                labels=np.array([0, 0, 0]))]
    r2 = indoor_eval(gts, dts, (0.25,), {0: 'c'})
    assert r2['c_AP_0.25'] == pytest.approx(0.5 + 0.5 * 2 / 3, abs=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF), reason='no reference fixtures')
def test_sunrgbd_fixture_loads():
    from dfm_tpu.data.indoor import SUNRGBDDataset
    ds = SUNRGBDDataset(
        f'{REF}/sunrgbd', f'{REF}/sunrgbd/sunrgbd_infos.pkl',
        train=True, num_points=1024, max_gt=8)
    s = ds.get_sample(0)
    assert s['points'].shape == (1024, 4)      # xyz + shifted height
    assert s['gt_boxes'].shape == (8, 7)
    assert int(s['gt_mask'].sum()) == 3
    assert np.isfinite(s['points']).all()
    # gt self-eval = perfect AP
    gts = ds.gt_annos()
    dts = [dict(boxes3d=g['gt_boxes'],
                scores=np.ones(len(g['gt_boxes']), np.float32),
                labels=g['gt_labels']) for g in gts]
    r = ds.evaluate(dts)
    assert r['mAP_0.25'] == pytest.approx(1.0)


@pytest.mark.skipif(not os.path.isdir(REF), reason='no reference fixtures')
def test_scannet_fixture_loads():
    from dfm_tpu.data.indoor import ScanNetDataset
    ds = ScanNetDataset(
        f'{REF}/scannet', f'{REF}/scannet/scannet_infos.pkl',
        train=False, num_points=2048, max_gt=32)
    s = ds.get_sample(0)
    assert s['points'].shape == (2048, 4)
    assert int(s['gt_mask'].sum()) == 27
    # aligned points should be roughly gravity-consistent with boxes:
    # some sampled points must fall inside the gt z-ranges
    boxes = s['gt_boxes'][s['gt_mask']]
    zlo, zhi = boxes[:, 2].min(), (boxes[:, 2] + boxes[:, 5]).max()
    frac = ((s['points'][:, 2] >= zlo - 0.5) &
            (s['points'][:, 2] <= zhi + 0.5)).mean()
    assert frac > 0.5
    gts = ds.gt_annos()
    dts = [dict(boxes3d=g['gt_boxes'],
                scores=np.ones(len(g['gt_boxes']), np.float32),
                labels=g['gt_labels']) for g in gts]
    r = ds.evaluate(dts)
    assert r['mAP_0.25'] == pytest.approx(1.0)
