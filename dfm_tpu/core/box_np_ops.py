"""Numpy box operations (host-side data prep / eval helpers).

Equivalent of the reference's `mmdet3d/core/bbox/box_np_ops.py` (827
LoC, numpy+numba): the subset with real call sites in this framework's
pipelines and tools, vectorized numpy (no numba). Boxes are (N, 7)
[x, y, z, w/dx, l/dy, h/dz, yaw] bottom-center unless noted.
"""

import numpy as np

__all__ = ['corners_3d', 'corners_bev', 'points_in_rbbox',
           'boxes3d_to_corners2d_image', 'camera_to_lidar_box',
           'lidar_to_camera_box', 'limit_period_np', 'box_collision_mask']


def limit_period_np(val, offset=0.5, period=np.pi * 2):
    return val - np.floor(val / period + offset) * period


def corners_3d(boxes, origin=(0.5, 0.5, 0.0)):
    """(N, 8, 3) corners (reference center_to_corner_box3d).

    origin: relative position of the box center inside the box
    (lidar convention: z at the bottom -> (0.5, 0.5, 0)).
    """
    boxes = np.asarray(boxes, np.float32)
    n = len(boxes)
    dims = boxes[:, 3:6]
    template = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                    indexing='ij'), -1).reshape(8, 3)
    corners = (template[None] - np.asarray(origin)) * dims[:, None]
    yaw = boxes[:, 6]
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.zeros((n, 3, 3), np.float32)
    rot[:, 0, 0] = c
    rot[:, 0, 1] = -s
    rot[:, 1, 0] = s
    rot[:, 1, 1] = c
    rot[:, 2, 2] = 1
    return np.einsum('nij,nkj->nki', rot, corners) + boxes[:, None, :3]


def corners_bev(boxes):
    """(N, 4, 2) BEV rectangle corners."""
    return corners_3d(boxes)[:, ::2, :2]


def points_in_rbbox(points, boxes, origin=(0.5, 0.5, 0.0)):
    """(P, N) bool — point inside rotated 3D box (reference
    points_in_rbbox via corner surfaces; here via box-frame transform).
    """
    points = np.asarray(points, np.float32)[:, :3]
    boxes = np.asarray(boxes, np.float32)
    local = points[:, None, :] - boxes[None, :, :3]        # (P, N, 3)
    yaw = boxes[:, 6]
    c, s = np.cos(-yaw), np.sin(-yaw)
    lx = local[..., 0] * c - local[..., 1] * s
    ly = local[..., 0] * s + local[..., 1] * c
    lz = local[..., 2]
    dx, dy, dz = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    return ((np.abs(lx) <= dx / 2) & (np.abs(ly) <= dy / 2) &
            (lz >= -dz * origin[2]) & (lz <= dz * (1 - origin[2])))


def camera_to_lidar_box(boxes_cam, r0_rect, tr_velo_to_cam):
    """KITTI camera-frame boxes -> lidar frame (reference
    box_camera_to_lidar): xyz via inverse rect/Tr, dims reorder
    (l, h, w)->(w, l, h) wait — cam (x,y,z, l,h,w, ry) ->
    lidar (x,y,z, w, l, h, yaw=-ry-pi/2)."""
    b = np.asarray(boxes_cam, np.float32)
    xyz = b[:, :3]
    ext = np.concatenate([xyz, np.ones((len(b), 1), np.float32)], -1)
    inv = np.linalg.inv(r0_rect @ tr_velo_to_cam)
    xyz_l = (ext @ inv.T)[:, :3]
    l, h, w = b[:, 3], b[:, 4], b[:, 5]
    yaw = -b[:, 6] - np.pi / 2
    return np.stack([xyz_l[:, 0], xyz_l[:, 1], xyz_l[:, 2],
                     w, l, h, limit_period_np(yaw)], -1)


def lidar_to_camera_box(boxes_lidar, r0_rect, tr_velo_to_cam):
    """Inverse of camera_to_lidar_box."""
    b = np.asarray(boxes_lidar, np.float32)
    ext = np.concatenate([b[:, :3], np.ones((len(b), 1), np.float32)],
                         -1)
    xyz_c = (ext @ (r0_rect @ tr_velo_to_cam).T)[:, :3]
    w, l, h = b[:, 3], b[:, 4], b[:, 5]
    ry = -b[:, 6] - np.pi / 2
    return np.stack([xyz_c[:, 0], xyz_c[:, 1], xyz_c[:, 2],
                     l, h, w, limit_period_np(ry)], -1)


def boxes3d_to_corners2d_image(boxes_cam, cam2img):
    """Project camera-frame boxes to image corner points (N, 8, 2)
    (reference points_cam2img over corners; gravity-center origin
    (0.5, 1.0, 0.5) for KITTI camera boxes)."""
    b = np.asarray(boxes_cam, np.float32)
    n = len(b)
    l, h, w = b[:, 3], b[:, 4], b[:, 5]
    x_c = np.array([1, 1, 1, 1, -1, -1, -1, -1], np.float32) / 2
    y_c = np.array([0, -1, 0, -1, 0, -1, 0, -1], np.float32)
    z_c = np.array([1, 1, -1, -1, 1, 1, -1, -1], np.float32) / 2
    corners = np.stack([x_c[None] * l[:, None],
                        y_c[None] * h[:, None],
                        z_c[None] * w[:, None]], -1)       # (N, 8, 3)
    ry = b[:, 6]
    c, s = np.cos(ry), np.sin(ry)
    rot = np.zeros((n, 3, 3), np.float32)
    rot[:, 0, 0] = c
    rot[:, 0, 2] = s
    rot[:, 1, 1] = 1
    rot[:, 2, 0] = -s
    rot[:, 2, 2] = c
    pts = np.einsum('nij,nkj->nki', rot, corners) + b[:, None, :3]
    ext = np.concatenate([pts, np.ones((n, 8, 1), np.float32)], -1)
    proj = ext @ np.asarray(cam2img, np.float32).T
    return proj[..., :2] / np.maximum(proj[..., 2:3], 1e-6)


def box_collision_mask(boxes_a, boxes_b):
    """(Na, Nb) BEV overlap test between rotated boxes (reference
    box_collision_test, used by the GT-paste sampler): exact rotated
    intersection area > 0 via the eval-side polygon clipper."""
    from ..evaluation.kitti_eval import _bev_corners, _rect_poly_area2
    a = np.asarray(boxes_a, np.float64)
    b = np.asarray(boxes_b, np.float64)
    bev_a = a[:, [0, 1, 3, 4, 6]]
    bev_b = b[:, [0, 1, 3, 4, 6]]
    inter = _rect_poly_area2(_bev_corners(bev_a), _bev_corners(bev_b))
    return inter > 1e-9
