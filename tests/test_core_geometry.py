import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.core import boxes as B
from dfm_tpu.core import coders, iou, nms, targets, transforms


def test_limit_period():
    v = jnp.asarray([0.0, np.pi, -np.pi, 2.6, -2.6])
    out = transforms.limit_period(v)
    assert np.all(np.asarray(out) >= -np.pi / 2 - 1e-6)
    assert np.all(np.asarray(out) < np.pi / 2 + 1e-6)
    np.testing.assert_allclose(out[0], 0.0, atol=1e-6)


def test_rotation_2d_ccw():
    pts = jnp.asarray([[1.0, 0.0]])
    out = transforms.rotation_2d(pts, jnp.asarray(np.pi / 2))
    np.testing.assert_allclose(np.asarray(out), [[0.0, 1.0]], atol=1e-6)


def test_cam_img_roundtrip():
    cam2img = jnp.asarray([[721.5, 0.0, 609.6, 44.9],
                           [0.0, 721.5, 172.8, 0.2],
                           [0.0, 0.0, 1.0, 0.003]])
    pts3d = jnp.asarray([[1.0, 2.0, 10.0], [-3.0, 0.5, 25.0]])
    uvd = transforms.points_cam2img(pts3d, cam2img, with_depth=True)
    back = transforms.points_img2cam(uvd, cam2img)
    # f32 precision limit with KITTI-scale intrinsics (the reference README
    # notes the same matrix-inverse sensitivity); exact in f64.
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts3d), atol=5e-2)


def test_corners_lidar_axis_aligned():
    box = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0]])
    c = np.asarray(B.corners_lidar(box))[0]
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c[:, 0].min(), -2.0, atol=1e-6)
    np.testing.assert_allclose(c[:, 0].max(), 2.0, atol=1e-6)
    np.testing.assert_allclose(c[:, 1].min(), -1.0, atol=1e-6)
    # bottom-center origin: z in [0, 1.5]
    np.testing.assert_allclose(c[:, 2].min(), 0.0, atol=1e-6)
    np.testing.assert_allclose(c[:, 2].max(), 1.5, atol=1e-6)


def test_corners_lidar_rotated_90():
    box = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, np.pi / 2]])
    c = np.asarray(B.corners_lidar(box))[0]
    # after 90deg CCW rotation dx extent lies along y
    np.testing.assert_allclose(c[:, 1].max() - c[:, 1].min(), 4.0, atol=1e-5)
    np.testing.assert_allclose(c[:, 0].max() - c[:, 0].min(), 2.0, atol=1e-5)


def test_cam_pseudo_lidar_roundtrip():
    box_cam = jnp.asarray([[1.5, 1.2, 20.0, 1.6, 1.56, 3.9, 0.3]])
    pl = B.cam_to_pseudo_lidar_boxes(box_cam)
    back = np.asarray(B.pseudo_lidar_to_cam_boxes(pl))
    ref = np.asarray(box_cam)
    np.testing.assert_allclose(back[..., :6], ref[..., :6], atol=1e-5)
    # yaw equal up to 2*pi period
    dyaw = (back[..., 6] - ref[..., 6]) % (2 * np.pi)
    assert np.allclose(dyaw, 0, atol=1e-5) or np.allclose(
        dyaw, 2 * np.pi, atol=1e-5)


def test_points_in_rotated_boxes_bev():
    box = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, np.pi / 2]])
    pts = jnp.asarray([[0.0, 1.5], [1.5, 0.0], [0.9, 0.0], [0.0, 2.5]])
    m = np.asarray(B.points_in_rotated_boxes_bev(pts, box))[:, 0]
    # box rotated 90deg: extends 2 in y, 1 in x
    assert list(m) == [True, False, True, False]


def test_coder_roundtrip():
    anchors = jnp.asarray([[10.0, 2.0, -1.78, 3.9, 1.6, 1.56, 0.0],
                           [5.0, -3.0, -0.6, 0.8, 0.6, 1.73, 1.57]])
    gts = jnp.asarray([[11.0, 2.5, -1.5, 4.2, 1.7, 1.5, 0.3],
                       [5.5, -2.5, -0.7, 0.9, 0.7, 1.8, 1.2]])
    deltas = coders.delta_xyzwlhr_encode(anchors, gts)
    back = coders.delta_xyzwlhr_decode(anchors, deltas)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gts), atol=1e-4)


def test_rotated_iou_identical():
    b = jnp.asarray([[0.0, 0.0, 4.0, 2.0, 0.5]])
    out = np.asarray(iou.rotated_iou_bev(b, b))
    np.testing.assert_allclose(out, [[1.0]], atol=1e-4)


def test_rotated_iou_axis_aligned_matches_aligned():
    b1 = jnp.asarray([[0.0, 0.0, 4.0, 2.0, 0.0]])
    b2 = jnp.asarray([[1.0, 0.5, 4.0, 2.0, 0.0]])
    out = np.asarray(iou.rotated_iou_bev(b1, b2))[0, 0]
    inter = 3.0 * 1.5
    expect = inter / (8 + 8 - inter)
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_rotated_iou_45deg_square():
    b1 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    out = np.asarray(iou.rotated_iou_bev(b1, b2))[0, 0]
    inter = 2 * (np.sqrt(2) - 1)
    expect = inter / (2 - inter)
    np.testing.assert_allclose(out, expect, atol=1e-3)


def test_rotated_iou_disjoint():
    b1 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.3]])
    b2 = jnp.asarray([[10.0, 10.0, 1.0, 1.0, 1.0]])
    out = np.asarray(iou.rotated_iou_bev(b1, b2))[0, 0]
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_rotated_iou_contained():
    b1 = jnp.asarray([[0.0, 0.0, 4.0, 4.0, 0.2]])
    b2 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.9]])
    out = np.asarray(iou.rotated_iou_bev(b1, b2))[0, 0]
    np.testing.assert_allclose(out, 1.0 / 16.0, atol=1e-3)


def test_rotated_iou_3d():
    b1 = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.0]])
    out = np.asarray(iou.rotated_iou_3d(b1, b2))[0, 0]
    # bev inter 4, z overlap 1 -> inter 4; union 16-4
    np.testing.assert_allclose(out, 4.0 / 12.0, atol=1e-4)


def test_nms_bev_basic():
    boxes = jnp.asarray([
        [0.0, 0.0, 4.0, 2.0, 0.0],
        [0.1, 0.0, 4.0, 2.0, 0.0],   # overlaps box 0
        [10.0, 0.0, 4.0, 2.0, 0.0],  # far away
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms.nms_bev(boxes, scores, 0.5))
    assert list(keep) == [True, False, True]


def test_multiclass_nms_shapes_and_content():
    boxes3d = jnp.asarray([
        [0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
        [0.05, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
        [10.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
    ])
    bev = boxes3d[:, [0, 1, 3, 4, 6]]
    scores = jnp.asarray([[0.9, 0.0], [0.8, 0.0], [0.0, 0.6]])
    out = nms.box3d_multiclass_nms(boxes3d, bev, scores, score_thr=0.1,
                                   nms_thr=0.5, max_num=4)
    mask = np.asarray(out['mask'])
    assert mask.sum() == 2
    kept_scores = np.sort(np.asarray(out['scores'])[mask])
    np.testing.assert_allclose(kept_scores, [0.6, 0.9], atol=1e-6)
    labels = np.asarray(out['labels'])[mask]
    assert set(labels.tolist()) == {0, 1}


def test_max_iou_assign():
    anchors = jnp.asarray([
        [0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
        [20.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
        [0.5, 0.2, 0.0, 4.0, 2.0, 1.5, 0.0],
    ])
    gts = jnp.asarray([
        [0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],  # padded
    ])
    gt_mask = jnp.asarray([True, False])
    overlaps = iou.nearest_bev_iou(gts, anchors)
    assigned = np.asarray(targets.max_iou_assign(
        overlaps, gt_mask, pos_iou_thr=0.6, neg_iou_thr=0.45,
        min_pos_iou=0.45))
    assert assigned[0] == 1      # exact match -> gt 1
    assert assigned[1] == 0      # disjoint -> negative
    assert assigned[2] == 1      # strong overlap -> positive


def test_anchor_targets_single_class():
    anchors = jnp.asarray([
        [0.0, 0.0, -1.78, 3.9, 1.6, 1.56, 0.0],
        [30.0, 10.0, -1.78, 3.9, 1.6, 1.56, 0.0],
    ])
    gts = jnp.asarray([[0.1, 0.0, -1.7, 3.9, 1.6, 1.5, 0.1]])
    res = targets.anchor_targets_single_class(
        anchors, gts, jnp.asarray([True]), pos_iou_thr=0.6,
        neg_iou_thr=0.45, min_pos_iou=0.45, class_id=0, num_classes=3)
    labels = np.asarray(res['labels'])
    assert labels[0] == 0 and labels[1] == 3
    assert np.asarray(res['pos_mask']).tolist() == [True, False]
    assert np.asarray(res['bbox_weights'])[0] == 1.0


def test_direction_target():
    # yaw 0 with offset 0.7854 -> bin: limit_period(-0.7854, 0, 2pi)
    # = 2pi - 0.7854 > pi -> bin 1
    d = np.asarray(targets.get_direction_target(
        jnp.asarray([0.0]), jnp.asarray([0.0])))
    assert d[0] == 1
    d2 = np.asarray(targets.get_direction_target(
        jnp.asarray([1.57]), jnp.asarray([0.0])))
    assert d2[0] == 0


def test_anchor_generator_matches_reference_layout():
    from dfm_tpu.core.anchors import Anchor3DRangeGenerator
    gen = Anchor3DRangeGenerator(
        ranges=[[2, -30.4, -1.78, 59.6, 30.4, -1.78]],
        sizes=[[3.9, 1.6, 1.56]], rotations=[0, 1.5707963])
    a = gen.grid_anchors((4, 6))
    assert a.shape == (1, 4, 6, 1, 2, 7)
    # x centers linspace over [2, 59.6] with 6 points
    np.testing.assert_allclose(a[0, 0, :, 0, 0, 0],
                               np.linspace(2, 59.6, 6), atol=1e-5)
    np.testing.assert_allclose(a[0, :, 0, 0, 0, 1],
                               np.linspace(-30.4, 30.4, 4), atol=1e-5)
    np.testing.assert_allclose(a[0, 0, 0, 0, 1, 6], 1.5707963, atol=1e-6)


def test_sin_difference():
    b1 = jnp.zeros((2, 7)).at[:, 6].set(jnp.asarray([0.3, 1.0]))
    b2 = jnp.zeros((2, 7)).at[:, 6].set(jnp.asarray([0.1, 2.0]))
    o1, o2 = targets.add_sin_difference(b1, b2)
    np.testing.assert_allclose(
        np.asarray(o1[:, 6]), np.sin([0.3, 1.0]) * np.cos([0.1, 2.0]),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(o2[:, 6]), np.cos([0.3, 1.0]) * np.sin([0.1, 2.0]),
        atol=1e-6)


def test_rotated_iou_random_vs_numpy_eval():
    """Cross-check the jax Liang-Barsky IoU against the independent
    numpy candidate-hull implementation in dfm_tpu.evaluation."""
    from dfm_tpu.evaluation.kitti_eval import bev_box_overlap
    rng = np.random.RandomState(7)
    b1 = np.stack([rng.uniform(-5, 5, 40), rng.uniform(-5, 5, 40),
                   rng.uniform(0.5, 6, 40), rng.uniform(0.5, 6, 40),
                   rng.uniform(-np.pi, np.pi, 40)], 1).astype(np.float32)
    b2 = np.stack([rng.uniform(-5, 5, 30), rng.uniform(-5, 5, 30),
                   rng.uniform(0.5, 6, 30), rng.uniform(0.5, 6, 30),
                   rng.uniform(-np.pi, np.pi, 30)], 1).astype(np.float32)
    ours = np.asarray(iou.rotated_iou_bev(jnp.asarray(b1), jnp.asarray(b2)))
    ref = bev_box_overlap(b1.astype(np.float64), b2.astype(np.float64))
    np.testing.assert_allclose(ours, ref, atol=2e-3)
