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


def _mk_anno(locs, dims, rys, names, scores=None, bbox_h=50.0,
             alphas=None, bboxes=None):
    n = len(names)
    if bboxes is None:
        bbox = np.zeros((n, 4))
        # spread boxes horizontally so they don't overlap each other
        bbox[:, 0] = np.arange(n) * 120.0
        bbox[:, 2] = bbox[:, 0] + 100
        bbox[:, 3] = bbox_h
    else:
        bbox = np.asarray(bboxes, np.float64)
    out = dict(name=np.array(names), truncated=np.zeros(n),
               occluded=np.zeros(n, np.int64),
               bbox=bbox, dimensions=np.asarray(dims, np.float64),
               location=np.asarray(locs, np.float64),
               rotation_y=np.asarray(rys, np.float64),
               alpha=(np.asarray(alphas, np.float64) if alphas is not None
                      else np.asarray(rys, np.float64)))
    if scores is not None:
        out['score'] = np.asarray(scores, np.float64)
    return out


def _mk_perfect(n, cls='Car', scores=None):
    """n well-separated GT boxes + identical detections."""
    locs = [[i * 10.0, 1, 10] for i in range(n)]
    dims = [[3.9, 1.5, 1.6]] * n
    rys = [0.1] * n
    gt = _mk_anno(locs, dims, rys, [cls] * n)
    dt = _mk_anno(locs, dims, rys, [cls] * n,
                  scores=(scores if scores is not None
                          else np.linspace(0.9, 0.5, n)))
    return gt, dt


def test_eval_perfect_detection():
    """Many perfectly-detected GT: R40 AP approaches 100 (39/40 grid
    points reachable with 40 GT -> 97.5)."""
    gt, dt = _mk_perfect(40)
    ap = eval_class([gt], [dt], 'Car', difficulty=1, metric='3d',
                    min_overlap=0.7)
    assert ap == pytest.approx(97.5, abs=0.01)


def test_eval_ap40_zero_pads_unreached_recall():
    """ADVICE r1 (high): 2 GT + 1 TP must yield ~0 AP (upstream
    get_mAP40 divides by the fixed 40 sample points; only recall grid
    index 0 is reached), NOT 100."""
    gt, dt = _mk_perfect(2)
    dt1 = {k: v[:1] for k, v in dt.items()}
    ap = eval_class([gt], [dt1], 'Car', difficulty=1, metric='3d',
                    min_overlap=0.7)
    assert ap == 0.0


def test_eval_half_recall():
    """40 GT, 20 detected perfectly: precision 1 up to recall 0.5 ->
    AP ~ 19/40 (upstream zero-padded R40 semantics)."""
    gt, dt = _mk_perfect(40)
    dt20 = {k: v[:20] for k, v in dt.items()}
    ap = eval_class([gt], [dt20], 'Car', difficulty=1, metric='3d',
                    min_overlap=0.7)
    assert ap == pytest.approx(100 * 19 / 40, abs=0.01)


def test_eval_dontcare_discounts_bbox_fp_only():
    """A detection inside a DontCare region is discounted for the bbox
    metric (IoF criterion) but counts as a normal FP for 3d."""
    gt, dt = _mk_perfect(40)
    # extra detection: high score, far from every GT, 2D bbox inside a
    # DontCare region
    dc_bbox = [5000.0, 0.0, 5100.0, 50.0]
    gt_dc = dict(gt)
    gt_dc['name'] = np.append(gt['name'], 'DontCare')
    gt_dc['truncated'] = np.append(gt['truncated'], -1.0)
    gt_dc['occluded'] = np.append(gt['occluded'], -1)
    gt_dc['alpha'] = np.append(gt['alpha'], -10.0)
    gt_dc['bbox'] = np.concatenate([gt['bbox'], [dc_bbox]])
    gt_dc['dimensions'] = np.concatenate([gt['dimensions'], [[-1., -1, -1]]])
    gt_dc['location'] = np.concatenate([gt['location'], [[-1000., -1, -1]]])
    gt_dc['rotation_y'] = np.append(gt['rotation_y'], -10.0)

    dt_fp = {k: np.concatenate([v, [v[0]]]) for k, v in dt.items()}
    dt_fp['score'][-1] = 0.95  # highest score -> depresses all points
    dt_fp['bbox'][-1] = [5010.0, 5.0, 5090.0, 45.0]  # inside DontCare
    dt_fp['location'][-1] = [500.0, 1, 10]           # matches no GT

    ap_bbox = eval_class([gt_dc], [dt_fp], 'Car', 1, 'bbox', 0.7)
    ap_3d = eval_class([gt_dc], [dt_fp], 'Car', 1, '3d', 0.7)
    ap_bbox_clean = eval_class([gt], [dt], 'Car', 1, 'bbox', 0.7)
    assert ap_bbox == pytest.approx(ap_bbox_clean, abs=0.01)  # discounted
    assert ap_3d < ap_bbox - 1.0                              # real FP


def test_eval_van_is_ignored_for_car():
    """A Van GT is ignore-class for Car eval: missing it is not a FN,
    and detecting it is neither TP nor FP."""
    gt, dt = _mk_perfect(40)
    gt_van = dict(gt)
    gt_van['name'] = np.append(gt['name'], 'Van')
    for k in ('truncated',):
        gt_van[k] = np.append(gt[k], 0.0)
    gt_van['occluded'] = np.append(gt['occluded'], 0)
    gt_van['alpha'] = np.append(gt['alpha'], 0.1)
    gt_van['bbox'] = np.concatenate([gt['bbox'], [[6000., 0, 6100, 50]]])
    gt_van['dimensions'] = np.concatenate([gt['dimensions'],
                                           [[3.9, 1.5, 1.6]]])
    gt_van['location'] = np.concatenate([gt['location'], [[600., 1, 10]]])
    gt_van['rotation_y'] = np.append(gt['rotation_y'], 0.1)

    ap_missed = eval_class([gt_van], [dt], 'Car', 1, '3d', 0.7)
    ap_base = eval_class([gt], [dt], 'Car', 1, '3d', 0.7)
    assert ap_missed == pytest.approx(ap_base, abs=0.01)

    # now detect the Van too (as a Car): should be absorbed, not FP
    dt_van = {k: np.concatenate([dt[k], [gt_van[k][-1]]])
              for k in ('bbox', 'dimensions', 'location', 'rotation_y',
                        'alpha')}
    dt_van['name'] = np.append(dt['name'], 'Car')
    dt_van['truncated'] = np.append(dt['truncated'], 0.0)
    dt_van['occluded'] = np.append(dt['occluded'], 0)
    dt_van['score'] = np.append(dt['score'], 0.95)
    ap_det = eval_class([gt_van], [dt_van], 'Car', 1, '3d', 0.7)
    assert ap_det == pytest.approx(ap_base, abs=0.01)


def test_eval_aos():
    """Perfect alphas -> AOS == bbox AP; alphas off by pi -> AOS ~ 0."""
    gt, dt = _mk_perfect(40)
    ap, aos = eval_class([gt], [dt], 'Car', 1, 'bbox', 0.7,
                         compute_aos=True)
    assert aos == pytest.approx(ap, abs=0.01)
    dt_flip = dict(dt)
    dt_flip['alpha'] = dt['alpha'] + np.pi
    ap2, aos2 = eval_class([gt], [dt_flip], 'Car', 1, 'bbox', 0.7,
                           compute_aos=True)
    assert ap2 == pytest.approx(ap, abs=0.01)
    assert aos2 < 1.0


def test_kitti_eval_loose_bbox_threshold_stays_strict():
    """The loose (0.5) setting does NOT relax the 2D bbox threshold
    (reference overlap_0_5 keeps row 0 at 0.7/0.5/0.5)."""
    from dfm_tpu.evaluation.kitti_eval import MIN_OVERLAPS
    assert MIN_OVERLAPS['loose']['bbox']['Car'] == 0.7
    assert MIN_OVERLAPS['loose']['3d']['Car'] == 0.5
    assert MIN_OVERLAPS['loose']['bev']['Pedestrian'] == 0.25
    assert MIN_OVERLAPS['strict']['3d']['Car'] == 0.7


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
