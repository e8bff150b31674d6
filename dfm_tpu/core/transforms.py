"""Core geometric transforms (pure JAX, fully vectorized, jit-safe).

Functional equivalents of the reference's box/point math
(reference: mmdet3d/core/bbox/structures/utils.py) designed for XLA:
everything is static-shape and batched; no data-dependent control flow.
"""

import jax
import jax.numpy as jnp
import numpy as np

# geometry einsums are tiny; run them at full f32 precision — the default
# (bf16) matmul precision costs ~0.5 px of projection error
_HP = jax.lax.Precision.HIGHEST

__all__ = [
    'limit_period', 'rotation_2d', 'rotation_matrix_3d', 'rotate_points_3d',
    'points_cam2img', 'points_img2cam', 'homogeneous', 'transform_points',
]


def limit_period(val, offset=0.5, period=np.pi):
    """Limit value into a period: result in [-offset*period, (1-offset)*period).

    Matches mmdet3d `limit_period` (reference utils.py:10-25).
    """
    return val - jnp.floor(val / period + offset) * period


def rotation_2d(points, angles):
    """Rotate 2D points counter-clockwise.

    Args:
        points: (..., 2)
        angles: broadcastable to points.shape[:-1]

    Returns:
        (..., 2) rotated points.

    Matches the 2D branch of mmdet3d `rotation_3d_in_axis` where the
    transposed rotation matrix is [[cos, sin], [-sin, cos]] applied as
    `points @ rot_mat_T` (reference utils.py:96-100).
    """
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    x, y = points[..., 0], points[..., 1]
    return jnp.stack([x * c - y * s, x * s + y * c], axis=-1)


def rotation_matrix_3d(angles, axis=2):
    """Transposed rotation matrices, shape (..., 3, 3), such that
    `points @ R_T` rotates points, matching mmdet3d `rotation_3d_in_axis`
    (reference utils.py:72-95).
    """
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    if axis == 1 or axis == -2:
        rows = [[c, zero, -s], [zero, one, zero], [s, zero, c]]
    elif axis == 2 or axis == -1:
        rows = [[c, s, zero], [-s, c, zero], [zero, zero, one]]
    elif axis == 0 or axis == -3:
        rows = [[one, zero, zero], [zero, c, s], [zero, -s, c]]
    else:
        raise ValueError(f'axis should be in [-3..2], got {axis}')
    rot_t = jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2)  # (..., 3, 3)
    return rot_t


def rotate_points_3d(points, angles, axis=2):
    """Rotate (..., M, 3) points by per-box angles (...,) around `axis`."""
    rot_t = rotation_matrix_3d(angles, axis=axis)  # (..., 3, 3)
    return jnp.einsum('...mj,...jk->...mk', points, rot_t, precision=_HP)


def homogeneous(points):
    """Append a 1 to the last axis: (..., D) -> (..., D+1)."""
    return jnp.concatenate(
        [points, jnp.ones_like(points[..., :1])], axis=-1)


def _pad_to_4x4(mat):
    """Embed a (3,3)/(3,4)/(4,4) matrix into eye(4)."""
    out = jnp.eye(4, dtype=mat.dtype)
    return out.at[:mat.shape[0], :mat.shape[1]].set(mat)


def points_cam2img(points_3d, proj_mat, with_depth=False):
    """Project camera-frame points to image plane.

    Args:
        points_3d: (..., 3) points in rectified camera coords.
        proj_mat: (3,3) / (3,4) / (4,4) projection matrix, or batched with
            leading dims broadcastable against points.

    Returns:
        (..., 2) pixel coords, or (..., 3) with depth appended.

    Matches mmdet3d `points_cam2img` (reference utils.py:176-214).
    """
    if proj_mat.shape[-2:] != (4, 4):
        proj_mat = _pad_to_4x4(proj_mat)
    pts = homogeneous(points_3d)
    uvw = jnp.einsum('...j,...kj->...k', pts, proj_mat, precision=_HP)
    uv = uvw[..., :2] / uvw[..., 2:3]
    if with_depth:
        return jnp.concatenate([uv, uvw[..., 2:3]], axis=-1)
    return uv


def points_img2cam(points, cam2img):
    """Back-project 2.5D image points (u, v, depth) to camera frame.

    Args:
        points: (..., 3) = (u, v, depth).
        cam2img: (3,3)/(3,4)/(4,4) intrinsics.

    Returns:
        (..., 3) camera-frame points.

    Matches mmdet3d `points_img2cam` (reference utils.py:218-248).
    """
    if cam2img.shape[-2:] != (4, 4):
        cam2img = _pad_to_4x4(cam2img)
    xys = points[..., :2]
    depths = points[..., 2:3]
    unnormed = jnp.concatenate([xys * depths, depths], axis=-1)
    homo = homogeneous(unnormed)  # (..., 4)
    # solve cam2img @ out = homo (better f32 accuracy than explicit inverse)
    flat = homo.reshape(-1, 4)
    out = jnp.linalg.solve(cam2img, flat.T).T.reshape(homo.shape)
    return out[..., :3]


def transform_points(points, mat4):
    """Apply a (4,4) rigid/projective transform to (..., 3) points."""
    homo = homogeneous(points)
    out = jnp.einsum('...j,...kj->...k', homo, mat4, precision=_HP)
    return out[..., :3]
