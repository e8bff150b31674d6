"""Rotated-box overlap math, pure JAX, fully vectorized + differentiable.

TPU-native replacement for the reference's CUDA ops:
  * `nms_rotated` pairwise rotated IoU (mmcv CUDA) used by
    `nms_bev` (reference core/post_processing/box3d_nms.py:231-271);
  * `diff_iou_rotated_3d` (mmcv CUDA) used by IOU3DLoss
    (reference models/losses/iou3d_loss.py);
  * numba-CUDA `rotate_iou_gpu_eval` used in KITTI eval.

Intersection of two convex polygons is computed WITHOUT vertex sorting:
the boundary of P cap Q consists of the sub-segments of P's edges inside
Q and of Q's edges inside P; each sub-segment is found by Liang-Barsky
clipping against the other quad's four half-planes, and Green's theorem
turns the unordered sub-segments into the area (sum of 0.5*cross(a, b)).
~30 fused VPU ops per pair - no argsort, no scatter - which is what
makes a 512x512 NMS IoU matrix cheap on TPU. Differentiable a.e.
"""

import jax
import jax.numpy as jnp

from .transforms import rotation_2d

__all__ = [
    'box_bev_corners', 'rotated_intersection_area', 'rotated_iou_bev',
    'rotated_iou_3d', 'aligned_iou_2d', 'nearest_bev_iou',
]

_EPS = 1e-8


def box_bev_corners(boxes_bev):
    """Corners of BEV boxes (x, y, dx, dy, yaw) -> (..., 4, 2), CCW order."""
    template = jnp.asarray(
        [[0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5], [0.5, -0.5]],
        dtype=boxes_bev.dtype)
    corners = template * boxes_bev[..., None, 2:4]
    corners = rotation_2d(corners, boxes_bev[..., None, 4])
    return corners + boxes_bev[..., None, :2]


def _clipped_boundary_area(p_corners, q_corners, boundary_eps):
    """Signed-area contribution of P's edges clipped inside quad Q.

    Args:
        p_corners: (..., 4, 2) CCW; q_corners: (..., 4, 2) CCW.
        boundary_eps: feasibility slack for edges lying exactly on Q's
            boundary (used to count shared boundaries exactly once).

    Returns:
        (...,) sum over P's edges of 0.5 * cross(a, b) for the inside
        sub-segment a->b (Green's theorem contribution).
    """
    p = p_corners                                    # (..., 4, 2) starts
    r = jnp.roll(p_corners, -1, axis=-2) - p         # (..., 4, 2) dirs
    q = q_corners
    e = jnp.roll(q_corners, -1, axis=-2) - q
    # inward (left) normals of Q's CCW edges
    n = jnp.stack([-e[..., 1], e[..., 0]], axis=-1)  # (..., 4, 2)
    c = jnp.sum(n * q, axis=-1)                      # (..., 4)

    # broadcast: P edge i (axis -2) vs Q plane k (axis -1); explicit
    # mul/add instead of einsum — XLA lowers 2-wide contractions poorly
    nk = n[..., None, :, :]                          # (..., 1, 4k, 2)
    pi = p[..., :, None, :]                          # (..., 4i, 1, 2)
    ri = r[..., :, None, :]
    a = nk[..., 0] * pi[..., 0] + nk[..., 1] * pi[..., 1] - c[..., None, :]
    b = nk[..., 0] * ri[..., 0] + nk[..., 1] * ri[..., 1]

    t_cross = -a / jnp.where(jnp.abs(b) > _EPS, b, _EPS)
    is_par = jnp.abs(b) <= _EPS
    lower = jnp.where((b > 0) & ~is_par, t_cross, 0.0)
    upper = jnp.where((b < 0) & ~is_par, t_cross, 1.0)
    t0 = jnp.maximum(jnp.max(lower, axis=-1), 0.0)   # (..., 4 edges)
    t1 = jnp.minimum(jnp.min(upper, axis=-1), 1.0)
    feasible = jnp.all(~is_par | (a >= boundary_eps), axis=-1)
    valid = feasible & (t1 > t0)

    a_pt = p + t0[..., None] * r
    b_pt = p + t1[..., None] * r
    contrib = 0.5 * (a_pt[..., 0] * b_pt[..., 1] -
                     a_pt[..., 1] * b_pt[..., 0])
    return jnp.sum(jnp.where(valid, contrib, 0.0), axis=-1)


def rotated_intersection_area(boxes1, boxes2):
    """Pairwise intersection areas of rotated BEV boxes.

    Args:
        boxes1: (N, 5), boxes2: (M, 5) as (x, y, dx, dy, yaw).

    Returns:
        (N, M) intersection areas.
    """
    c1 = box_bev_corners(boxes1)[:, None]            # (N, 1, 4, 2)
    c2 = box_bev_corners(boxes2)[None, :]            # (1, M, 4, 2)
    n, m = boxes1.shape[0], boxes2.shape[0]
    c1 = jnp.broadcast_to(c1, (n, m, 4, 2))
    c2 = jnp.broadcast_to(c2, (n, m, 4, 2))
    # shared-boundary segments counted once: strict for the second sweep
    area = _clipped_boundary_area(c1, c2, -1e-6) + \
        _clipped_boundary_area(c2, c1, 1e-6)
    return jnp.maximum(area, 0.0)


def rotated_iou_bev(boxes1, boxes2):
    """Pairwise rotated IoU in BEV: (N, 5) x (M, 5) -> (N, M)."""
    inter = rotated_intersection_area(boxes1, boxes2)
    a1 = boxes1[:, 2] * boxes1[:, 3]
    a2 = boxes2[:, 2] * boxes2[:, 3]
    union = a1[:, None] + a2[None, :] - inter
    return inter / jnp.maximum(union, _EPS)


def rotated_iou_3d(boxes1, boxes2, mode='iou'):
    """Pairwise rotated 3D IoU of LiDAR-frame (N, 7) x (M, 7) boxes.

    Volume overlap = BEV rotated intersection x z-extent overlap.
    Differentiable; matches the semantics of mmcv `diff_iou_rotated_3d`
    used by the reference's IOU3DLoss.
    """
    bev1 = boxes1[:, [0, 1, 3, 4, 6]]
    bev2 = boxes2[:, [0, 1, 3, 4, 6]]
    inter_bev = rotated_intersection_area(bev1, bev2)
    zmin1, zmax1 = boxes1[:, 2], boxes1[:, 2] + boxes1[:, 5]
    zmin2, zmax2 = boxes2[:, 2], boxes2[:, 2] + boxes2[:, 5]
    z_overlap = jnp.maximum(
        jnp.minimum(zmax1[:, None], zmax2[None, :]) -
        jnp.maximum(zmin1[:, None], zmin2[None, :]), 0.0)
    inter = inter_bev * z_overlap
    vol1 = boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5]
    vol2 = boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5]
    if mode == 'iou':
        denom = vol1[:, None] + vol2[None, :] - inter
    elif mode == 'iof':
        denom = vol1[:, None] * jnp.ones_like(vol2)[None, :]
    else:
        raise ValueError(mode)
    return inter / jnp.maximum(denom, _EPS)


def aligned_iou_2d(boxes1, boxes2, mode='iou'):
    """Pairwise IoU of axis-aligned (N, 4) x (M, 4) xyxy boxes."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = jnp.maximum(boxes1[:, 2] - boxes1[:, 0], 0) * \
        jnp.maximum(boxes1[:, 3] - boxes1[:, 1], 0)
    a2 = jnp.maximum(boxes2[:, 2] - boxes2[:, 0], 0) * \
        jnp.maximum(boxes2[:, 3] - boxes2[:, 1], 0)
    if mode == 'iou':
        denom = a1[:, None] + a2[None, :] - inter
    elif mode == 'iof':
        denom = jnp.broadcast_to(a1[:, None], inter.shape)
    else:
        raise ValueError(mode)
    return inter / jnp.maximum(denom, _EPS)


def nearest_bev_iou(boxes1, boxes2):
    """`BboxOverlapsNearest3D`-style IoU: rotations snapped to the nearest
    axis, then plain 2D IoU (reference core/bbox/iou_calculators/
    iou3d_calculator.py:10-56). Used for anchor target assignment.

    Args:
        boxes1, boxes2: (N, 7) / (M, 7) LiDAR-frame boxes.
    """
    from .boxes import bev_lidar, nearest_bev_xyxy
    b1 = nearest_bev_xyxy(bev_lidar(boxes1))
    b2 = nearest_bev_xyxy(bev_lidar(boxes2))
    return aligned_iou_2d(b1, b2)
