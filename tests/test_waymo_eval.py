"""Waymo eval stack: proto codec, KITTI->Waymo conversion, LET metric
(validated against the official binary when present), dataset evaluate."""

import os

import numpy as np
import pytest

from dfm_tpu.evaluation import waymo_proto as WP
from dfm_tpu.evaluation import waymo_eval as WE
from dfm_tpu.evaluation.waymo_let import let_detection_metrics

REF_GT_BIN = ('/root/reference/tests/data/waymo/waymo_format/gt.bin')


def _gt(x, y, z=1.0, heading=0.2, cls=1, ctx='c', ts=1):
    box = WP.Box(center_x=x, center_y=y, center_z=z, length=4.5,
                 width=2.0, height=1.6, heading=heading)
    return WP.ObjectPred(box=box, type=cls, score=0.5, context_name=ctx,
                         frame_timestamp_micros=ts,
                         num_lidar_points_in_box=50,
                         most_visible_camera_name='FRONT',
                         camera_synced_box=box)


def _pred(x, y, score, z=1.0, heading=0.2, cls=1, ctx='c', ts=1):
    box = WP.Box(center_x=x, center_y=y, center_z=z, length=4.5,
                 width=2.0, height=1.6, heading=heading)
    return WP.ObjectPred(box=box, type=cls, score=score, context_name=ctx,
                         frame_timestamp_micros=ts)


def test_proto_roundtrip_synthetic():
    objs = [_gt(30, 5), _pred(31, 5, 0.9)]
    data = WP.encode_objects(objs)
    back = WP.decode_objects(data)
    assert len(back) == 2
    assert abs(back[0].box.center_x - 30) < 1e-9
    assert back[0].most_visible_camera_name == 'FRONT'
    assert back[0].camera_synced_box is not None
    assert back[1].type == 1 and abs(back[1].score - 0.9) < 1e-6
    assert WP.encode_objects(back) == data


@pytest.mark.skipif(not os.path.exists(REF_GT_BIN),
                    reason='reference fixture not present')
def test_proto_roundtrip_reference_fixture():
    with open(REF_GT_BIN, 'rb') as f:
        data = f.read()
    objs = WP.decode_objects(data)
    assert len(objs) == 1
    assert objs[0].type == WP.TYPE_VEHICLE
    assert abs(objs[0].box.length - 4.36) < 1e-3
    assert WP.encode_objects(objs) == data


def test_let_perfect_detection():
    gts = [_gt(30, 0), _gt(40, 8)]
    preds = [_pred(30, 0, 0.9), _pred(40, 8, 0.8)]
    m = let_detection_metrics(preds, gts)
    assert m['Vehicle mAP'] == pytest.approx(1.0)
    assert m['Vehicle mAPL'] == pytest.approx(1.0)
    assert m['Vehicle mAPH'] == pytest.approx(1.0)


def test_let_longitudinal_affinity_camera_origin():
    """Affinity uses the line of sight from the camera at
    (1.43, 0, 2.18) — values locked to the official binary."""
    gts = [_gt(30, 0)]
    m = let_detection_metrics([_pred(31.5, 0, 0.9)], gts)
    assert m['Vehicle mAP'] == pytest.approx(1.0)
    assert m['Vehicle mAPL'] == pytest.approx(0.475868, abs=1e-5)


def test_let_heading_weight():
    gts = [_gt(30, 0)]
    m = let_detection_metrics([_pred(30, 0, 0.9, heading=0.7)], gts)
    assert m['Vehicle mAPH'] == pytest.approx(1 - 0.5 / np.pi, abs=1e-6)


def test_let_pr_integration_locked():
    """Two-GT case with an interleaved FP: value locked to the official
    binary (trapezoid ramp at the recall-delta cap)."""
    gts = [_gt(30, 0), _gt(30, 10)]
    preds = [_pred(30, 0, 0.9), _pred(50, -15, 0.7), _pred(30, 10, 0.5)]
    m = let_detection_metrics(preds, gts)
    assert m['Vehicle mAP'] == pytest.approx(0.841667, abs=1e-5)


def test_let_beyond_tolerance_is_fp():
    gts = [_gt(30, 0)]
    m = let_detection_metrics([_pred(35, 0, 0.9)], gts)  # 5 m >> 2.86 m
    assert m['Vehicle mAP'] == 0.0


@pytest.mark.skipif(WE._find_binary('let') is None,
                    reason='official LET binary not available')
def test_let_matches_official_binary_random(tmp_path):
    rng = np.random.RandomState(7)
    gts, preds = [], []
    for f in range(3):
        ctx, ts = f'ctx{f}', 100 + f
        for i in range(10):
            c = rng.uniform([8, -25, 0], [70, 25, 2])
            h = float(rng.uniform(-np.pi, np.pi))
            gts.append(_gt(c[0], c[1], c[2], h, ctx=ctx, ts=ts))
            if rng.rand() > 0.3:
                u = c / np.linalg.norm(c)
                e = rng.uniform(-1, 1) * np.linalg.norm(c) * 0.08
                pc = c + u * e + rng.randn(3) * 0.04
                preds.append(_pred(pc[0], pc[1],
                                   float(rng.uniform(0.2, 1.0)), pc[2],
                                   h + float(rng.randn() * 0.04),
                                   ctx=ctx, ts=ts))
        for _ in range(3):
            c = rng.uniform([8, -25, 0], [70, 25, 2])
            preds.append(_pred(c[0] + 100, c[1], float(rng.uniform(0, 0.5)),
                               ctx=ctx, ts=ts))
    pred_bin = str(tmp_path / 'p.bin')
    gt_bin = str(tmp_path / 'g.bin')
    with open(pred_bin, 'wb') as f:
        f.write(WP.encode_objects(preds))
    with open(gt_bin, 'wb') as f:
        f.write(WP.encode_objects(gts))
    official = WE.parse_let_text(WE.run_let_binary(pred_bin, gt_bin))
    mine = let_detection_metrics(preds, gts)
    for k in ('Vehicle mAPL', 'Vehicle mAP', 'Vehicle mAPH'):
        assert mine[k] == pytest.approx(official[k], abs=0.04), k


def test_kitti_to_waymo_object_math():
    t_cam2veh = np.eye(4)
    t_cam2veh[0, 3] = 1.5
    t_k2w = t_cam2veh @ WE.T_REF_TO_FRONT_CAM
    res = dict(name=np.array(['Car']),
               dimensions=np.array([[4.2, 1.6, 1.9]]),   # l, h, w
               location=np.array([[2.0, 1.8, 20.0]]),    # x, y(bottom), z
               rotation_y=np.array([0.3]),
               score=np.array([0.77]))
    objs = WE.kitti_result_to_objects(res, t_k2w, 'ctx', 123)
    assert len(objs) == 1
    o = objs[0]
    # cam (x=2, y=1.8-0.8=1.0, z=20) -> front-cam axes (z, -x, -y) + tx
    assert o.box.center_x == pytest.approx(20.0 + 1.5)
    assert o.box.center_y == pytest.approx(-2.0)
    assert o.box.center_z == pytest.approx(-1.0)
    assert o.box.length == pytest.approx(4.2)
    assert o.box.width == pytest.approx(1.9)
    assert o.box.height == pytest.approx(1.6)
    assert o.box.heading == pytest.approx(-(0.3 + np.pi / 2))
    assert o.context_name == 'ctx'
    assert o.frame_timestamp_micros == 123


def test_dataset_evaluate_end_to_end(tmp_path):
    """WaymoDataset.format_results + evaluate on synthetic frames,
    using the python fallback (and the binary when present)."""
    from dfm_tpu.data.waymo import WaymoDataset
    infos = [dict(context_name='ctxA', timestamp_micros=11),
             dict(context_name='ctxB', timestamp_micros=22)]
    ds = WaymoDataset.__new__(WaymoDataset)
    ds.infos = infos
    gts = [_gt(30, 0, ctx='ctxA', ts=11), _gt(25, 5, ctx='ctxB', ts=22)]
    gt_bin = str(tmp_path / 'gt.bin')
    WE.gt_annos_to_bin(gts, gt_bin)
    results = [
        dict(boxes_3d=np.array([[30, 0, 1 - 0.8, 4.5, 2.0, 1.6, 0.2]]),
             labels_3d=np.array([0]), scores_3d=np.array([0.9])),
        dict(boxes_3d=np.array([[25, 5, 5 - 0.8 + 4, 4.5, 2.0, 1.6, 0.2]]),
             labels_3d=np.array([0]), scores_3d=np.array([0.4])),
    ]
    # second frame's z is deliberately off by 4 m -> no vertical overlap
    ap = ds.evaluate(results, gt_bin, work_dir=str(tmp_path))
    assert ap['Vehicle mAP'] == pytest.approx(0.5, abs=0.02)
    assert ap['_source'] in ('official_binary', 'python_fallback')


def test_gt_bin_from_infos(tmp_path):
    """create_waymo_gt_bin --infos path: cam_sync filtering + synced
    boxes, evaluated loop against a matching prediction."""
    import importlib
    sys_path_tool = os.path.join(os.path.dirname(__file__), '..', 'tools')
    import sys
    sys.path.insert(0, os.path.abspath(sys_path_tool))
    cgb = importlib.import_module('create_waymo_gt_bin')
    infos = [dict(context_name='ctxA', timestamp_micros=5, annos=dict(
        gt_boxes_3d=np.array([[30, 0, 0.2, 4.5, 2.0, 1.6, 0.2],
                              [40, 5, 0.2, 4.5, 2.0, 1.6, 0.0]]),
        labels=np.array([0, 0]),
        camera_names=['FRONT', ''],      # second not visible -> dropped
        num_lidar_points=np.array([10, 10])))]
    objs = cgb.gt_objects_from_infos(infos, cam_sync=True)
    assert len(objs) == 1
    assert objs[0].most_visible_camera_name == 'FRONT'
    assert objs[0].camera_synced_box is not None
    assert objs[0].box.center_z == pytest.approx(1.0)
    gt_bin = str(tmp_path / 'gt.bin')
    with open(gt_bin, 'wb') as f:
        f.write(WP.encode_objects(objs))
    preds = [_pred(30, 0, 0.9, z=1.0, ctx='ctxA', ts=5)]
    pred_bin = str(tmp_path / 'p.bin')
    with open(pred_bin, 'wb') as f:
        f.write(WP.encode_objects(preds))
    ap = WE.evaluate_waymo(pred_bin, gt_bin)
    assert ap['Vehicle mAP'] == pytest.approx(1.0, abs=1e-4)
