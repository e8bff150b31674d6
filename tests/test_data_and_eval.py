"""Data pipeline + evaluation tests on a synthetic KITTI tree."""

import os

import numpy as np
import pytest

from dfm_tpu.data.calibration import Calibration
from dfm_tpu.data.kitti import (CLASS_NAMES, KittiDataset, build_kitti_infos,
                                cam_label_to_pseudo_lidar, parse_calib_file,
                                parse_label_file)
from dfm_tpu.evaluation import (detections_to_kitti_annos, eval_class,
                                kitti_eval, pseudo_lidar_boxes_to_cam)

H, W = 96, 320
FX = 120.0


@pytest.fixture(scope='module')
def kitti_root(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp('kitti')
    base = root / 'training'
    for sub in ('image_2', 'prev_2', 'calib', 'label_2', 'velodyne', 'poses'):
        (base / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    p2 = np.array([[FX, 0, W / 2, 0.1], [0, FX, H / 2, 0.05],
                   [0, 0, 1, 0.002]])
    for idx in range(2):
        sid = f'{idx:06d}'
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(base / 'image_2' / f'{sid}.png'), img)
        cv2.imwrite(str(base / 'prev_2' / f'{sid}_01.png'), img)
        with open(base / 'calib' / f'{sid}.txt', 'w') as f:
            f.write('P2: ' + ' '.join(str(v) for v in p2.reshape(-1)) + '\n')
            f.write('R0_rect: ' + ' '.join(
                str(v) for v in np.eye(3).reshape(-1)) + '\n')
            f.write('Tr_velo_to_cam: ' + ' '.join(
                str(v) for v in np.eye(4)[:3].reshape(-1)) + '\n')
        # one car at 15 m ahead, slightly right; one pedestrian
        with open(base / 'label_2' / f'{sid}.txt', 'w') as f:
            f.write('Car 0.0 0 -0.2 100 40 160 80 1.5 1.6 3.9 '
                    '1.0 1.2 15.0 0.1\n')
            f.write('Pedestrian 0.0 0 0.3 180 35 200 85 1.7 0.6 0.8 '
                    '-2.0 1.3 10.0 -0.3\n')
            f.write('DontCare -1 -1 -10 0 0 10 10 -1 -1 -1 '
                    '-1000 -1000 -1000 -10\n')
        # points: cluster around the car in velodyne==rect frame (eye V2C)
        pts = rng.randn(500, 4).astype(np.float32)
        pts[:, 0] = pts[:, 0] * 0.5 + 1.0   # x (right in cam)
        pts[:, 1] = pts[:, 1] * 0.3 + 1.0   # y (down)
        pts[:, 2] = np.abs(pts[:, 2]) * 5 + 8.0  # z forward
        pts.tofile(str(base / 'velodyne' / f'{sid}.bin'))
        poses = np.stack([np.eye(4), np.eye(4)])
        poses[1][2, 3] = -1.0  # prev cam 1 m behind
        np.savetxt(str(base / 'poses' / f'{sid}.txt'),
                   poses.reshape(-1, 16))
    return str(root)


def test_parse_and_build_infos(kitti_root):
    infos = build_kitti_infos(kitti_root, [0, 1])
    assert len(infos) == 2
    info = infos[0]
    assert info['annos']['gt_boxes_pl'].shape == (2, 7)
    assert list(info['annos']['labels']) == [0, 1]
    assert len(info['sweeps']) == 1
    np.testing.assert_allclose(info['sweeps'][0]['cam2global'][2, 3], -1.0)
    # pseudo-lidar conversion: car at cam (1.0, 1.2, 15.0) -> pl
    np.testing.assert_allclose(info['annos']['gt_boxes_pl'][0, :3],
                               [15.0, -1.0, -1.2], atol=1e-5)
    # dims (l, h, w) = (3.9, 1.5, 1.6) -> pl (dx=l, dy=w, dz=h)
    np.testing.assert_allclose(info['annos']['gt_boxes_pl'][0, 3:6],
                               [3.9, 1.6, 1.5], atol=1e-5)


def test_pipeline_sample_shapes(kitti_root):
    infos = build_kitti_infos(kitti_root, [0])
    ds = KittiDataset(kitti_root, infos, train=True,
                      pipeline_kwargs=dict(crop_size=(64, 256), max_gt=8))
    rng = np.random.default_rng(0)
    s = ds.get_sample(0, rng)
    assert s['img'].shape == (2, 64, 256, 3)
    assert s['gt_boxes'].shape == (8, 7)
    assert s['gt_mask'].sum() >= 1
    assert s['depth_img'].shape == (64, 256)
    assert s['cam2img'].shape == (4, 4)
    assert np.isfinite(s['img']).all()
    # cur2prev must carry the 1 m ego-motion
    np.testing.assert_allclose(s['cur2prev'][2, 3], 1.0, atol=1e-6)


def test_pipeline_depth_alignment(kitti_root):
    """Projected depth pixels must be consistent with the augmented
    intrinsics: back-projecting depth pixels lands near the point cloud."""
    infos = build_kitti_infos(kitti_root, [0])
    ds = KittiDataset(kitti_root, infos, train=False,
                      pipeline_kwargs=dict(crop_size=(64, 256), max_gt=8))
    rng = np.random.default_rng(1)
    s = ds.get_sample(0, rng)
    v, u = np.nonzero(s['depth_img'])
    assert len(v) > 10  # some lidar points visible
    d = s['depth_img'][v, u]
    assert (d > 2).all() and (d < 60).all()


def test_flip_geometry_consistency(kitti_root):
    """With flip forced, the gt y flips and cam2img changes accordingly."""
    infos = build_kitti_infos(kitti_root, [0])
    ds = KittiDataset(kitti_root, infos, train=True,
                      pipeline_kwargs=dict(crop_size=(64, 256), max_gt=8,
                                           flip_ratio=1.0))
    ds2 = KittiDataset(kitti_root, infos, train=True,
                       pipeline_kwargs=dict(crop_size=(64, 256), max_gt=8,
                                            flip_ratio=0.0))
    s1 = ds.get_sample(0, np.random.default_rng(0))
    s0 = ds2.get_sample(0, np.random.default_rng(0))
    assert s1['flip'] == 1.0 and s0['flip'] == 0.0
    g1 = s1['gt_boxes'][s1['gt_mask']]
    g0 = s0['gt_boxes'][s0['gt_mask']]
    np.testing.assert_allclose(g1[:, 1], -g0[:, 1], atol=1e-5)
    np.testing.assert_allclose(g1[:, 0], g0[:, 0], atol=1e-5)


def test_results_roundtrip():
    boxes_cam_loc = np.array([[1.0, 1.2, 15.0]])
    dims_lhw = np.array([[3.9, 1.5, 1.6]])
    ry = np.array([0.1])
    pl = cam_label_to_pseudo_lidar(boxes_cam_loc, dims_lhw, ry)
    loc, dims, ry2 = pseudo_lidar_boxes_to_cam(pl)
    np.testing.assert_allclose(loc, boxes_cam_loc, atol=1e-5)
    np.testing.assert_allclose(dims, dims_lhw, atol=1e-5)
    np.testing.assert_allclose(ry2, ry, atol=1e-5)


def _mk_anno(locs, dims, rys, names, scores=None, bbox_h=50.0):
    n = len(names)
    bbox = np.zeros((n, 4))
    bbox[:, 2] = 100
    bbox[:, 3] = bbox_h
    out = dict(name=np.array(names), truncated=np.zeros(n),
               occluded=np.zeros(n, np.int64),
               bbox=bbox, dimensions=np.asarray(dims, np.float64),
               location=np.asarray(locs, np.float64),
               rotation_y=np.asarray(rys, np.float64))
    if scores is not None:
        out['score'] = np.asarray(scores, np.float64)
    return out


def test_eval_perfect_detection():
    gt = [_mk_anno([[0, 1, 10]], [[3.9, 1.5, 1.6]], [0.1], ['Car'])]
    dt = [_mk_anno([[0, 1, 10]], [[3.9, 1.5, 1.6]], [0.1], ['Car'],
                   scores=[0.9])]
    ap = eval_class(gt, dt, 'Car', difficulty=1, metric='3d',
                    min_overlap=0.7)
    assert ap > 99.0


def test_eval_missed_detection():
    gt = [_mk_anno([[0, 1, 10]], [[3.9, 1.5, 1.6]], [0.1], ['Car'])]
    dt = [_mk_anno(np.zeros((0, 3)), np.zeros((0, 3)), [], [],
                   scores=[])]
    ap = eval_class(gt, dt, 'Car', difficulty=1, metric='3d',
                    min_overlap=0.7)
    assert ap == 0.0


def test_eval_wrong_position_bev():
    gt = [_mk_anno([[0, 1, 10]], [[3.9, 1.5, 1.6]], [0.1], ['Car'])]
    dt = [_mk_anno([[5, 1, 30]], [[3.9, 1.5, 1.6]], [0.1], ['Car'],
                   scores=[0.9])]
    ap = eval_class(gt, dt, 'Car', difficulty=1, metric='bev',
                    min_overlap=0.7)
    assert ap == 0.0


def test_detections_to_kitti_annos():
    pl = cam_label_to_pseudo_lidar(
        np.array([[1.0, 1.2, 15.0]]), np.array([[3.9, 1.5, 1.6]]),
        np.array([0.1]))
    det = dict(boxes3d=np.concatenate([pl, np.zeros((3, 7))]),
               scores=np.array([0.8, 0, 0, 0]),
               labels=np.array([0, -1, -1, -1]),
               mask=np.array([True, False, False, False]))
    p2 = np.array([[FX, 0, W / 2, 0], [0, FX, H / 2, 0], [0, 0, 1, 0]])
    anno = detections_to_kitti_annos(det, p2, (H, W))
    assert list(anno['name']) == ['Car']
    np.testing.assert_allclose(anno['location'][0], [1.0, 1.2, 15.0],
                               atol=1e-4)
    assert anno['bbox'][0, 2] > anno['bbox'][0, 0]
