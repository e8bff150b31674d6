"""tools/test.py real-data eval CLI smoke per dataset family.

Each test builds a tiny synthetic data tree (matching the dataset's
info schema), shrinks the model via --cfg-options, and drives the
ACTUAL CLI main() end to end: dataset -> restore(random) -> jit infer
-> format_results -> metric. Mirrors the reference's test CLI
(tools/test.py:130 -> dataset.evaluate)."""

import os
import pickle
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(argv, capsys):
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    import tools.test as tt
    old = sys.argv
    sys.argv = ['test.py'] + argv
    try:
        tt.main()
    finally:
        sys.argv = old
    return capsys.readouterr().out


@pytest.fixture(scope='module')
def waymo_tree(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp('waymo_cli')
    (root / 'training' / 'image_0').mkdir(parents=True)
    rng = np.random.RandomState(0)
    infos = []
    for idx in range(2):
        views = []
        for v in range(2):
            p = f'training/image_0/{idx:06d}_{v}.png'
            cv2.imwrite(str(root / p),
                        (rng.rand(120, 180, 3) * 255).astype(np.uint8))
            K = np.eye(4)
            K[0, 0] = K[1, 1] = 100.0
            K[0, 2], K[1, 2] = 90, 60
            ang = 2 * np.pi * v / 2
            c, s = np.cos(ang), np.sin(ang)
            rot = np.array([[-s, c, 0, 0], [0, 0, -1, 0],
                            [c, s, 0, 0], [0, 0, 0, 1]])
            views.append(dict(image_path=p, lidar2img=K @ rot,
                              cam2img=K))
        boxes = np.array([[6.0, 0, 0, 4, 2, 1.6, 0.1]], np.float32)
        infos.append(dict(
            sample_idx=idx, images=views, ego2global=np.eye(4),
            sweeps=[], context_name='ctx', timestamp_micros=1000 + idx,
            annos=dict(gt_boxes=boxes, gt_boxes_3d=boxes,
                       labels=np.array([0]), names=['Car'],
                       camera_names=['FRONT'],
                       num_lidar_points=np.array([50]))))
    with open(root / 'waymo_infos_val.pkl', 'wb') as f:
        pickle.dump(infos, f)
    return str(root)


def test_waymo_eval_cli(waymo_tree, capsys):
    out = _run_cli([
        os.path.join(REPO, 'configs/multiview_dfm_r101_waymo_camsync.py'),
        '--eval', 'waymo', '--max-samples', '2', '--cfg-options',
        f'data.data_root={waymo_tree}', 'data.num_views=2',
        'data.target_hw=(96,128)', 'model.num_views=2',
        'model.backbone_depth=18', 'model.feat_channels=32',
        'model.voxel_grid=(4,40,44)', 'model.nms_pre=128',
        'model.max_num=16'], capsys)
    assert 'LET' in out or 'mAP' in out or 'AP' in out, out
    assert '[gt] built' in out          # gt bin from the val infos


@pytest.fixture(scope='module')
def nus_tree(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp('nus_cli')
    (root / 'samples').mkdir()
    rng = np.random.RandomState(1)
    infos = []
    for idx in range(2):
        p = f'samples/{idx:06d}.jpg'
        cv2.imwrite(str(root / p),
                    (rng.rand(90, 160, 3) * 255).astype(np.uint8))
        cam = np.eye(4, dtype=np.float32)
        cam[0, 0] = cam[1, 1] = 120.0
        cam[0, 2], cam[1, 2] = 80, 45
        infos.append(dict(
            img_path=p, cam2img=cam,
            gt_boxes=np.array([[1.0, 0.8, 12.0, 1.9, 4.5, 1.6,
                                0.2, 0.0, 0.0]], np.float32),
            gt_names=['car'], gt_attrs=np.array([0])))
    with open(root / 'nuscenes_infos_mono_val.pkl', 'wb') as f:
        pickle.dump(infos, f)
    return str(root)


def test_nuscenes_eval_cli(nus_tree, capsys):
    out = _run_cli([
        os.path.join(REPO, 'configs/fcos3d_r101_nus_mono.py'),
        '--eval', 'nuscenes', '--max-samples', '2', '--cfg-options',
        f'data.data_root={nus_tree}',
        'model.backbone_depth=18', 'model.feat_channels=32',
        'model.nms_pre=128', 'model.max_num=16'], capsys)
    assert 'mAP' in out or 'NDS' in out, out


@pytest.fixture(scope='module')
def lyft_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp('lyft_cli')
    (root / 'lidar').mkdir()
    rng = np.random.RandomState(2)
    infos = []
    for idx in range(2):
        name = f'lidar/frame_{idx}.bin'
        pts = rng.randn(2048, 5).astype(np.float32) * 8
        pts.tofile(str(root / name))
        infos.append(dict(
            lidar_path=name, token=f't{idx}', sweeps=[],
            timestamp=1e6 * idx,
            gt_boxes=np.array([[5.0, 2.0, 0.2, 4.6, 1.9, 1.7, 0.3]],
                              np.float32),
            gt_names=['car'], num_lidar_pts=np.array([40])))
    with open(root / 'lyft_infos_val.pkl', 'wb') as f:
        pickle.dump(dict(infos=infos, metadata={}), f)
    return str(root)


def test_lyft_eval_cli(lyft_tree, capsys):
    out = _run_cli([
        os.path.join(REPO, 'configs/hv_ssn_secfpn_lyft.py'),
        '--eval', 'lyft', '--max-samples', '2', '--cfg-options',
        f'data.data_root={lyft_tree}', 'data.max_points=2048',
        'model.point_cloud_range=(-12.8,-12.8,-5.0,12.8,12.8,3.0)',
        'model.nms_pre=128', 'model.max_num=16'], capsys)
    assert 'mAP' in out, out
