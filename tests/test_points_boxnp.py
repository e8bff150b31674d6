"""core/points.py + core/box_np_ops.py + visualization dumps."""

import os

import numpy as np

from dfm_tpu.core import box_np_ops as B
from dfm_tpu.core.points import (Points, cam2lidar, convert_points,
                                 lidar2cam, points_in_range,
                                 rotate_points_z)


def test_frame_conversions_roundtrip():
    rng = np.random.RandomState(0)
    xyz = rng.randn(50, 3).astype(np.float32)
    for a in ('cam', 'lidar', 'depth'):
        for b in ('cam', 'lidar', 'depth'):
            back = convert_points(convert_points(xyz, a, b), b, a)
            np.testing.assert_allclose(back, xyz, atol=1e-6)
    # semantic check: cam z-forward becomes lidar x-forward
    p = cam2lidar(np.asarray([[0.0, 0.0, 5.0]]))
    np.testing.assert_allclose(p, [[5.0, 0.0, 0.0]], atol=1e-6)
    np.testing.assert_allclose(lidar2cam(p), [[0.0, 0.0, 5.0]],
                               atol=1e-6)


def test_points_container():
    pts = Points(np.asarray([[1.0, 2.0, 0.5, 9.0]]), 'lidar')
    cam = pts.to('cam')
    assert cam.frame == 'cam' and cam.arr[0, 3] == 9.0
    np.testing.assert_allclose(cam.to('lidar').arr, pts.arr, atol=1e-6)
    assert len(pts.in_range([0, 0, 0, 2, 3, 1])) == 1
    assert len(pts.in_range([0, 0, 0, 1, 1, 1])) == 0


def test_points_in_rbbox():
    boxes = np.asarray([[0, 0, 0, 2.0, 1.0, 1.0, np.pi / 2]])
    # box rotated 90deg: extent 1 in x, 2 in y
    pts = np.asarray([[0.0, 0.9, 0.5], [0.9, 0.0, 0.5],
                      [0.0, 0.0, 1.5]])
    m = B.points_in_rbbox(pts, boxes)
    assert m[0, 0] and not m[1, 0] and not m[2, 0]


def test_kitti_cam_lidar_box_roundtrip():
    rng = np.random.RandomState(1)
    r0 = np.eye(4, dtype=np.float32)
    tr = np.eye(4, dtype=np.float32)
    tr[:3, 3] = [0.1, -0.2, 0.3]
    cam_boxes = np.stack([
        rng.uniform(-10, 10, 5), rng.uniform(0, 2, 5),
        rng.uniform(5, 40, 5), rng.uniform(3, 5, 5),
        rng.uniform(1, 2, 5), rng.uniform(1.4, 1.8, 5),
        rng.uniform(-np.pi, np.pi, 5)], -1).astype(np.float32)
    lidar = B.camera_to_lidar_box(cam_boxes, r0, tr)
    back = B.lidar_to_camera_box(lidar, r0, tr)
    np.testing.assert_allclose(back[:, :6], cam_boxes[:, :6], atol=1e-4)
    dyaw = np.abs(B.limit_period_np(back[:, 6] - cam_boxes[:, 6]))
    assert dyaw.max() < 1e-4


def test_box_collision_mask():
    a = np.asarray([[0, 0, 0, 2, 2, 1, 0.0]])
    b = np.asarray([[1.0, 1.0, 0, 2, 2, 1, 0.0],
                    [5.0, 5.0, 0, 2, 2, 1, 0.0]])
    m = B.box_collision_mask(a, b)
    assert m[0, 0] and not m[0, 1]


def test_meshlab_dump(tmp_path):
    from dfm_tpu.visualization import show_result_meshlab
    pts = np.random.RandomState(0).randn(20, 3)
    boxes = np.asarray([[0, 0, 0, 2, 1, 1, 0.3]])
    paths = show_result_meshlab(pts, boxes, boxes, str(tmp_path), 's0')
    for p in paths.values():
        assert os.path.getsize(p) > 0
    txt = open(paths['pred']).read()
    assert txt.count('v ') >= 8 and 'l ' in txt


def test_corners_and_projection():
    boxes = np.asarray([[0, 0, 0, 2, 4, 1, 0.0]])
    c = B.corners_3d(boxes)
    assert c.shape == (1, 8, 3)
    np.testing.assert_allclose(c[0, :, 2].min(), 0.0, atol=1e-6)
    np.testing.assert_allclose(c[0, :, 2].max(), 1.0, atol=1e-6)
    cam2img = np.eye(4)
    cam2img[0, 0] = cam2img[1, 1] = 700
    cam2img[0, 2], cam2img[1, 2] = 600, 180
    cam_boxes = np.asarray([[0.0, 1.0, 10.0, 4.0, 1.5, 1.8, 0.0]])
    uv = B.boxes3d_to_corners2d_image(cam_boxes, cam2img)
    assert uv.shape == (1, 8, 2)
    assert np.isfinite(uv).all()


def test_corner_to_surfaces_and_points_in_surfaces():
    from dfm_tpu.core.box_np_ops import (corner_to_surfaces_3d,
                                         corners_3d, points_in_rbbox,
                                         points_in_surfaces)
    rng = np.random.RandomState(0)
    boxes = np.stack([
        np.array([1.0, 2.0, 0.0, 2.0, 3.0, 1.5, 0.4], np.float32),
        np.array([-4.0, 1.0, -1.0, 1.0, 1.0, 2.0, -0.7], np.float32)])
    pts = rng.uniform(-6, 6, (400, 3)).astype(np.float32)
    surfaces = corner_to_surfaces_3d(corners_3d(boxes))
    got = points_in_surfaces(pts, surfaces)
    want = points_in_rbbox(pts, boxes)
    assert (got == want).all()


def test_projection_matrix_to_crt_roundtrip():
    from dfm_tpu.core.box_np_ops import projection_matrix_to_CRT_kitti
    c = np.array([[720.0, 0, 600], [0, 720, 180], [0, 0, 1]])
    r = np.eye(3)
    t = np.array([0.05, -0.01, 0.3])
    p = c @ np.concatenate([r, t[:, None]], axis=1)
    c2, r2, t2 = projection_matrix_to_CRT_kitti(p)
    np.testing.assert_allclose(c2, c, atol=1e-6)
    np.testing.assert_allclose(r2, r, atol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-6)


def test_remove_outside_points_keeps_infield():
    from dfm_tpu.core.box_np_ops import remove_outside_points
    p2 = np.array([[700.0, 0, 600, 0], [0, 700, 180, 0],
                   [0, 0, 1, 0]])
    rect = np.eye(4)
    trv2c = np.eye(4)[:3]
    # z-forward camera points: one in front center, one behind
    pts = np.array([[0.0, 0.0, 10.0], [0.0, 0.0, -5.0],
                    [50.0, 0.0, 10.0]], np.float32)
    kept = remove_outside_points(pts, rect, trv2c, p2, (360, 1200))
    assert len(kept) == 1 and kept[0, 2] == 10.0


def test_rbbox2d_to_near_bbox():
    from dfm_tpu.core.box_np_ops import rbbox2d_to_near_bbox
    r = np.array([[0, 0, 4, 2, 0.0], [0, 0, 4, 2, np.pi / 2]],
                 np.float32)
    nb = rbbox2d_to_near_bbox(r)
    np.testing.assert_allclose(nb[0], [-2, -1, 2, 1])
    np.testing.assert_allclose(nb[1], [-1, -2, 1, 2])
