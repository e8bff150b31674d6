"""Functional 3D box ops over plain arrays (pure JAX, static shapes).

Boxes are (..., 7) arrays ``(x, y, z, x_size, y_size, z_size, yaw)``.

Two frames are used (mirroring the reference's box structures,
mmdet3d/core/bbox/structures/{lidar_box3d.py, cam_box3d.py}):

* LIDAR / pseudo-LiDAR: z-up, x-forward, y-left; box origin is the
  *bottom* center (relative origin (0.5, 0.5, 0)); yaw around z (axis 2),
  counter-clockwise, 0 = +x.
* CAM: y-down, x-right, z-forward; box origin is bottom center
  (relative origin (0.5, 1.0, 0.5)); yaw around y (axis 1).

DfM operates in the pseudo-LiDAR frame: ``pl = (z_cam, -x_cam, -y_cam)``
(reference mmdet3d/models/necks/feature_transformation.py:176-178 and
mmdet3d/core/camera/calibration.py).

Unlike the reference's tensor-wrapper classes, everything here is a pure
function over arrays so it composes with jit/vmap/grad and keeps shapes
static (padded boxes + masks instead of variable-length tensors).
"""

import jax.numpy as jnp
import numpy as np

from .transforms import limit_period, rotate_points_3d, rotation_2d

__all__ = [
    'gravity_center', 'corners_lidar', 'corners_cam', 'bev_lidar',
    'nearest_bev_xyxy', 'flip_bev_horizontal_lidar', 'in_range_bev',
    'points_in_rotated_boxes_bev', 'cam_to_pseudo_lidar_points',
    'pseudo_lidar_to_cam_points', 'cam_to_pseudo_lidar_boxes',
    'pseudo_lidar_to_cam_boxes',
]

# Corner template in unravel order [0,1,3,2,4,5,7,6] as in the reference
# (lidar_box3d.py:76-82): (x0y0z0, x0y0z1, x0y1z1, x0y1z0, x1y0z0, ...).
_CORNERS_NORM = np.stack(
    np.unravel_index(np.arange(8), [2] * 3), axis=1)[[0, 1, 3, 2, 4, 5, 7, 6]]
_CORNERS_NORM = _CORNERS_NORM.astype(np.float32)


def gravity_center(boxes):
    """(..., 7) -> (..., 3) box volumetric center (LiDAR frame: z + h/2)."""
    return jnp.concatenate(
        [boxes[..., :2], boxes[..., 2:3] + boxes[..., 5:6] * 0.5], axis=-1)


def corners_lidar(boxes):
    """Corners of LiDAR-frame boxes: (..., 7) -> (..., 8, 3).

    Matches LiDARInstance3DBoxes.corners (reference lidar_box3d.py:50-89):
    relative origin (0.5, 0.5, 0), yaw around z.
    """
    dims = boxes[..., 3:6]
    corners_norm = jnp.asarray(_CORNERS_NORM, dtype=boxes.dtype) - \
        jnp.asarray([0.5, 0.5, 0.0], dtype=boxes.dtype)
    corners = dims[..., None, :] * corners_norm  # (..., 8, 3)
    corners = rotate_points_3d(corners, boxes[..., 6], axis=2)
    return corners + boxes[..., None, :3]


def corners_cam(boxes):
    """Corners of camera-frame boxes: (..., 7) -> (..., 8, 3).

    Matches CameraInstance3DBoxes.corners (origin (0.5, 1.0, 0.5),
    yaw around y).
    """
    dims = boxes[..., 3:6]
    corners_norm = jnp.asarray(_CORNERS_NORM, dtype=boxes.dtype) - \
        jnp.asarray([0.5, 1.0, 0.5], dtype=boxes.dtype)
    corners = dims[..., None, :] * corners_norm
    corners = rotate_points_3d(corners, boxes[..., 6], axis=1)
    return corners + boxes[..., None, :3]


def bev_lidar(boxes):
    """BEV boxes (x, y, dx, dy, yaw) from LiDAR-frame boxes."""
    return boxes[..., [0, 1, 3, 4, 6]]


def nearest_bev_xyxy(boxes_bev):
    """Axis-aligned nearest BEV boxes (x1, y1, x2, y2).

    Rotations are snapped to the nearest axis: if |limit_period(yaw)| >
    pi/4 the in-plane dims are swapped (matches BaseInstance3DBoxes
    .nearest_bev used by BboxOverlapsNearest3D).
    """
    rot = limit_period(boxes_bev[..., 4], 0.5, np.pi)
    swap = jnp.abs(rot) > (np.pi / 4)
    dx = jnp.where(swap, boxes_bev[..., 3], boxes_bev[..., 2])
    dy = jnp.where(swap, boxes_bev[..., 2], boxes_bev[..., 3])
    cx, cy = boxes_bev[..., 0], boxes_bev[..., 1]
    return jnp.stack(
        [cx - dx / 2, cy - dy / 2, cx + dx / 2, cy + dy / 2], axis=-1)


def flip_bev_horizontal_lidar(boxes):
    """Flip LiDAR boxes along y (BEV horizontal): y -> -y, yaw -> -yaw."""
    return boxes.at[..., 1].multiply(-1).at[..., 6].multiply(-1)


def in_range_bev(boxes, box_range):
    """Mask of boxes whose center is inside (xmin, ymin, xmax, ymax)."""
    x, y = boxes[..., 0], boxes[..., 1]
    return ((x > box_range[0]) & (y > box_range[1]) &
            (x < box_range[2]) & (y < box_range[3]))


def points_in_rotated_boxes_bev(points_xy, boxes):
    """Point-in-rotated-box test in BEV.

    Args:
        points_xy: (P, 2) query points.
        boxes: (G, 7) LiDAR-frame boxes (only x, y, dx, dy, yaw used).

    Returns:
        (P, G) boolean mask.

    TPU-native replacement for the reference's `points_in_boxes_part`
    CUDA op used for imitation masks (reference detectors/dfm.py:487);
    vectorized instead of per-point kernel threads.
    """
    rel = points_xy[:, None, :] - boxes[None, :, :2]  # (P, G, 2)
    # rotate into box frame (clockwise by yaw)
    local = rotation_2d(rel, -boxes[None, :, 6])
    half = boxes[None, :, 3:5] * 0.5
    return jnp.all(jnp.abs(local) <= half, axis=-1)


def cam_to_pseudo_lidar_points(pts):
    """(..., 3) camera frame -> pseudo-LiDAR frame: (z, -x, -y)."""
    return jnp.stack([pts[..., 2], -pts[..., 0], -pts[..., 1]], axis=-1)


def pseudo_lidar_to_cam_points(pts):
    """(..., 3) pseudo-LiDAR frame -> camera frame: (-y, -z, x).

    Matches `project_pseudo_lidar_to_rectcam`
    (reference feature_transformation.py:176-178).
    """
    return jnp.stack([-pts[..., 1], -pts[..., 2], pts[..., 0]], axis=-1)


def cam_to_pseudo_lidar_boxes(boxes):
    """Convert camera-frame boxes (..., 7) to pseudo-LiDAR boxes.

    Centers: (x,y,z)_cam -> (z, -x, -y); sizes (dx,dy,dz)_cam ->
    (dx, dz, dy) and yaw r_lidar = -r_cam - pi/2, matching
    Box3DMode.convert CAM->LIDAR (reference box_3d_mode.py:132-146).
    """
    center = cam_to_pseudo_lidar_points(boxes[..., :3])
    dims = boxes[..., [3, 5, 4]]
    yaw = limit_period(-boxes[..., 6:7] - np.pi / 2, period=2 * np.pi)
    return jnp.concatenate([center, dims, yaw], axis=-1)


def pseudo_lidar_to_cam_boxes(boxes):
    """Inverse of `cam_to_pseudo_lidar_boxes` (LIDAR->CAM,
    reference box_3d_mode.py:115-131)."""
    center = pseudo_lidar_to_cam_points(boxes[..., :3])
    dims = boxes[..., [3, 5, 4]]
    yaw = limit_period(-boxes[..., 6:7] - np.pi / 2, period=2 * np.pi)
    return jnp.concatenate([center, dims, yaw], axis=-1)
