"""Numpy box operations (host-side data prep / eval helpers).

Equivalent of the reference's `mmdet3d/core/bbox/box_np_ops.py` (827
LoC, numpy+numba): the subset with real call sites in this framework's
pipelines and tools, vectorized numpy (no numba). Boxes are (N, 7)
[x, y, z, w/dx, l/dy, h/dz, yaw] bottom-center unless noted.
"""

import numpy as np

__all__ = ['corners_3d', 'corners_bev', 'points_in_rbbox',
           'boxes3d_to_corners2d_image', 'camera_to_lidar_box',
           'lidar_to_camera_box', 'limit_period_np', 'box_collision_mask',
           'center_to_corner_box2d', 'rotation_points_single_angle',
           'corner_to_surfaces_3d', 'points_in_surfaces',
           'projection_matrix_to_CRT_kitti', 'get_frustum',
           'remove_outside_points', 'rbbox2d_to_near_bbox',
           'minmax_to_corner_2d']


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


# ---- reference box_np_ops long tail (converter / indoor surfaces) ----

def center_to_corner_box2d(centers, dims, angles=None):
    """(N, 4, 2) BEV corners from centers/dims/angles (reference
    center_to_corner_box2d — the dbsampler's collision geometry)."""
    n = len(centers)
    boxes = np.concatenate(
        [np.asarray(centers, np.float32)[:, :2],
         np.zeros((n, 1), np.float32),
         np.asarray(dims, np.float32)[:, :2],
         np.ones((n, 1), np.float32),
         (np.zeros((n,), np.float32) if angles is None
          else np.asarray(angles, np.float32))[:, None]], axis=1)
    return corners_bev(boxes)


def rotation_points_single_angle(points, angle, axis=2):
    """Rotate (N, 3) points around one axis (reference
    rotation_points_single_angle)."""
    c, s = np.cos(angle), np.sin(angle)
    if axis == 2:
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    elif axis == 1:
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    else:
        rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    return np.asarray(points, np.float32) @ rot.T


def corner_to_surfaces_3d(corners):
    """(N, 8, 3) corners -> (N, 6, 4, 3) surfaces with outward normals
    (reference corner_to_surfaces_3d; corner order = corners_3d's
    z-major meshgrid template)."""
    # corners index bits: (x, y, z) from meshgrid(ij) over [0,1]^3:
    # idx = x*4 + y*2 + z
    faces = [
        [0, 2, 6, 4],   # z = 0 (bottom)
        [1, 5, 7, 3],   # z = 1 (top)
        [0, 1, 3, 2],   # x = 0
        [4, 6, 7, 5],   # x = 1
        [0, 4, 5, 1],   # y = 0
        [2, 3, 7, 6],   # y = 1
    ]
    return np.asarray(corners, np.float32)[:, faces]


def points_in_surfaces(points, surfaces):
    """(P, N) bool — point inside the convex hull bounded by each box's
    6 surfaces (reference points_in_convex_polygon_3d_jit, vectorized
    numpy instead of numba)."""
    pts = np.asarray(points, np.float32)[:, :3]
    sf = np.asarray(surfaces, np.float32)       # (N, 6, 4, 3)
    a = sf[:, :, 1] - sf[:, :, 0]
    b = sf[:, :, 2] - sf[:, :, 0]
    normal = np.cross(a, b)                     # (N, 6, 3)
    d = np.einsum('nfi,nfi->nf', normal, sf[:, :, 0])
    side = np.einsum('pi,nfi->pnf', pts, normal) - d[None]
    inside_pos = (side >= -1e-6).all(-1)
    inside_neg = (side <= 1e-6).all(-1)
    return inside_pos | inside_neg               # orientation-agnostic


def projection_matrix_to_CRT_kitti(proj):
    """P = C @ [R|T]: recover the KITTI camera intrinsics C (3, 3),
    rotation R (3, 3) and translation T (3,) (reference
    projection_matrix_to_CRT_kitti — RQ decomposition via the flipped
    QR trick)."""
    cr = np.asarray(proj, np.float64)[:3, :3]
    ct = np.asarray(proj, np.float64)[:3, 3]
    rinv_cinv = np.linalg.inv(cr)
    q, r = np.linalg.qr(rinv_cinv)
    c = np.linalg.inv(r)
    rot = q.T
    t = r @ ct
    # normalize so that diag(C) > 0
    sgn = np.sign(np.diag(c))
    c = c * sgn[None]
    rot = rot * sgn[:, None]
    t = t * sgn
    return c, rot, t


def get_frustum(bbox_image, c_mat, near_clip=0.001, far_clip=100):
    """Camera-frame frustum corners (8, 3) of an image bbox (reference
    get_frustum)."""
    fku, fkv = c_mat[0, 0], -c_mat[1, 1]
    u0v0 = c_mat[0:2, 2]
    z_points = np.array([near_clip] * 4 + [far_clip] * 4,
                        np.float64)[:, None]
    x1, y1, x2, y2 = bbox_image
    box_corners = np.array(
        [[x1, y1], [x1, y2], [x2, y2], [x2, y1]], np.float64)
    near_box_corners = (box_corners - u0v0) / np.array(
        [fku / near_clip, -np.abs(fkv) / near_clip])
    far_box_corners = (box_corners - u0v0) / np.array(
        [fku / far_clip, -np.abs(fkv) / far_clip])
    ret_xy = np.concatenate([near_box_corners, far_box_corners], axis=0)
    return np.concatenate([ret_xy, z_points], axis=1)


def remove_outside_points(points, rect, trv2c, p2, image_shape):
    """Drop lidar points projecting outside the image (reference
    remove_outside_points — used by the converters' reduced clouds)."""
    c, r, t = projection_matrix_to_CRT_kitti(p2)
    image_bbox = [0, 0, image_shape[1], image_shape[0]]
    frustum = get_frustum(image_bbox, c)
    frustum -= t
    frustum = (np.linalg.inv(r) @ frustum.T).T
    ext = np.concatenate(
        [frustum, np.ones((8, 1))], axis=1)
    frustum = (ext @ np.linalg.inv(
        np.asarray(rect, np.float64) @
        _pad4(np.asarray(trv2c, np.float64))).T)[:, :3]
    surfaces = corner_to_surfaces_3d_frustum(frustum[None])
    mask = points_in_surfaces(points, surfaces)[:, 0]
    return points[mask]


def corner_to_surfaces_3d_frustum(corners):
    """Frustum corner order (near 4 then far 4) -> 6 surfaces."""
    faces = [[0, 1, 2, 3], [7, 6, 5, 4], [0, 3, 7, 4],
             [1, 5, 6, 2], [0, 4, 5, 1], [3, 2, 6, 7]]
    return np.asarray(corners, np.float32)[:, faces]


def rbbox2d_to_near_bbox(rbboxes):
    """Rotated BEV (N, 5) -> nearest axis-aligned (N, 4) xyxy
    (reference rbbox2d_to_near_bbox)."""
    rots = np.abs(limit_period_np(np.asarray(rbboxes)[:, 4], 0.5,
                                  np.pi))
    cond = (rots > np.pi / 4)[..., None]
    b = np.asarray(rbboxes, np.float32)
    swapped = np.where(cond, b[:, [0, 1, 3, 2, 4]], b)
    ctr, dim = swapped[:, :2], swapped[:, 2:4]
    return np.concatenate([ctr - dim / 2, ctr + dim / 2], axis=1)


def minmax_to_corner_2d(minmax_box):
    """(N, 4) xyxy -> (N, 4, 2) corners."""
    b = np.asarray(minmax_box, np.float32)
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    return np.stack([np.stack([x1, y1], -1), np.stack([x2, y1], -1),
                     np.stack([x2, y2], -1), np.stack([x1, y2], -1)],
                    axis=1)


def _pad4(m):
    out = np.eye(4, dtype=m.dtype)
    out[:m.shape[0], :m.shape[1]] = m
    return out
