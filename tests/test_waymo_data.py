"""Waymo multi-view dataset assembly tests (synthetic tree)."""

import os

import numpy as np
import pytest

from dfm_tpu.data.waymo import WaymoDataset, assemble_multiview_sample


@pytest.fixture(scope='module')
def waymo_root(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp('waymo')
    (root / 'training' / 'image_0').mkdir(parents=True)
    rng = np.random.RandomState(0)
    infos = []
    for idx in range(2):
        views = []
        for v in range(3):
            p = f'training/image_0/{idx:06d}_{v}.png'
            cv2.imwrite(str(root / p),
                        (rng.rand(240, 360, 3) * 255).astype(np.uint8))
            K = np.eye(4)
            K[0, 0] = K[1, 1] = 200.0
            K[0, 2], K[1, 2] = 180, 120
            ang = 2 * np.pi * v / 3
            c, s = np.cos(ang), np.sin(ang)
            rot = np.array([[-s, c, 0, 0], [0, 0, -1, 0],
                            [c, s, 0, 0], [0, 0, 0, 1]])
            views.append(dict(image_path=p, lidar2img=K @ rot,
                              cam2img=K))
        e2g = np.eye(4)
        e2g[0, 3] = idx * 2.0  # vehicle moves forward
        prev = dict(images=views, ego2global=e2g @ np.diag([1., 1, 1, 1]))
        prev['ego2global'] = prev['ego2global'].copy()
        prev['ego2global'][0, 3] -= 1.0
        infos.append(dict(
            sample_idx=idx, images=views, ego2global=e2g,
            sweeps=[prev],
            annos=dict(gt_boxes=np.array([[5.0, 0, 0, 4, 2, 1.6, 0.1]]),
                       labels=np.array([0]), names=['Car'])))
    return str(root), infos


def test_assemble_sample(waymo_root):
    root, infos = waymo_root
    s = assemble_multiview_sample(infos[0], root, num_frames=2,
                                  target_hw=(256, 384), num_views=3,
                                  max_gt=8)
    assert s['imgs'].shape == (2, 3, 256, 384, 3)
    assert s['lidar2img'].shape == (2, 3, 4, 4)
    assert s['gt_mask'].sum() == 1
    assert np.isfinite(s['imgs']).all()
    # prev-frame lidar2img differs from cur (ego-motion rewrite)
    assert not np.allclose(s['lidar2img'][0, 0], s['lidar2img'][1, 0])


def test_waymo_dataset(waymo_root):
    root, infos = waymo_root
    ds = WaymoDataset(root, infos, num_frames=1, target_hw=(128, 192),
                      num_views=3, max_gt=4)
    assert len(ds) == 2
    s = ds.get_sample(1)
    assert s['imgs'].shape == (1, 3, 128, 192, 3)


def test_load_mode_cam_frame_expands(waymo_root):
    root, infos = waymo_root
    import copy
    ds = WaymoDataset(root, copy.deepcopy(infos), num_views=3,
                      target_hw=(256, 384), load_mode='cam_frame')
    assert len(ds) == len(infos) * 3
    s = ds.get_sample(0)
    assert s['imgs'].shape[1] == 1          # single view
    # gt filtering: the box at x=5 ahead is visible in some cameras
    # and not in others (cameras look in 3 directions)
    vis = [int(ds.get_sample(i)['gt_mask'].sum()) for i in range(3)]
    assert max(vis) == 1 and min(vis) == 0


def test_load_mode_cam_mono(waymo_root):
    root, infos = waymo_root
    import copy
    ds = WaymoDataset(root, copy.deepcopy(infos), num_views=3,
                      target_hw=(256, 384), load_mode='cam_mono')
    assert len(ds) == len(infos)
    assert ds.get_sample(0)['imgs'].shape[1] == 1


def test_cam_sync_swaps_annos(waymo_root):
    root, infos = waymo_root
    import copy
    infos2 = copy.deepcopy(infos)
    for info in infos2:
        info['cam_sync_annos'] = dict(
            gt_boxes=np.array([[9.0, 1, 0, 4, 2, 1.6, 0.0]]),
            labels=np.array([1]), names=['Pedestrian'])
    ds = WaymoDataset(root, infos2, num_views=3,
                      target_hw=(256, 384), cam_sync=True)
    s = ds.get_sample(0)
    got = s['gt_boxes'][s['gt_mask']]
    assert abs(float(got[0, 0]) - 9.0) < 1e-5


def test_merge_multi_view_boxes(waymo_root):
    root, infos = waymo_root
    ds = WaymoDataset(root, list(infos), num_views=3,
                      target_hw=(256, 384))
    per_cam = [
        dict(boxes3d=np.array([[5.0, 0, 0, 4, 2, 1.6, 0.0]]),
             scores=np.array([0.9]), labels=np.array([0])),
        dict(boxes3d=np.array([[5.05, 0, 0, 4, 2, 1.6, 0.0],   # dup
                               [20.0, 5, 0, 4, 2, 1.6, 0.0]]),
             scores=np.array([0.8, 0.7]), labels=np.array([0, 0])),
    ]
    merged = ds.merge_multi_view_boxes(per_cam)
    # the duplicate is suppressed, two distinct boxes survive
    assert len(merged['scores']) == 2
    assert abs(merged['boxes3d'][0, 0] - 5.0) < 1e-4
    assert abs(merged['boxes3d'][1, 0] - 20.0) < 1e-4
