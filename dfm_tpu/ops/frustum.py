"""Frustum -> voxel lifting ops (DfM feature transformation).

Rebuilds the math of the reference's `FrustumToVoxel.forward`
(mmdet3d/models/necks/feature_transformation.py:68-173) TPU-first:

* voxel-center projection + validity masks are computed per sample from
  the (augmented) intrinsics, all static shapes;
* the reference samples a softmax over the x4 trilinearly-upsampled
  cost volume (288 x 320 x 1280 — ~0.5 GB materialized on GPU). Here
  that volume is never built: with align_corners=True, linearly
  resampling a linear upsampling is *exactly* the base interpolant, so
  only a per-fine-pixel logsumexp map (H_pad x W_pad) is needed to
  evaluate softmax(upsample(cost)) at arbitrary query points. The lse
  map is computed in W-chunks with one (288, 72) interpolation matmul
  per chunk (MXU work instead of HBM traffic).
"""

import jax
import jax.numpy as jnp

from ..core.boxes import pseudo_lidar_to_cam_points
from ..core.transforms import points_cam2img
from .grid_sample import bilinear_sample, trilinear_sample
from .resize import interp_matrix

__all__ = ['project_voxels_to_frustum', 'sample_stereo_volume',
           'depth_softmax_lse_map', 'sample_upsampled_softmax',
           'sample_sem_features']


def project_voxels_to_frustum(coors_pl, cam2img):
    """Project pseudo-LiDAR voxel centers into (u, v, depth).

    Args:
        coors_pl: (..., 3) pseudo-LiDAR voxel centers.
        cam2img: (4, 4) or (3, 4) current (augmented) intrinsics.

    Returns:
        (..., 3) = (u, v, depth_cam).
    """
    cam_pts = pseudo_lidar_to_cam_points(coors_pl)
    uv = points_cam2img(cam_pts, cam2img)
    return jnp.concatenate([uv, cam_pts[..., 2:3]], axis=-1)


def _frustum_indices(coord_img, pad_shape, depth_min, depth_max, vol_shape):
    """Map (u, v, depth) to stereo-volume indices + validity, exactly as
    the reference's normalization (feature_transformation.py:100-127):
    u, v normalized by (pad - 1), depth by [depth_min, depth_max]."""
    d, h, w = vol_shape
    pad_h, pad_w = pad_shape
    u, v, dep = coord_img[..., 0], coord_img[..., 1], coord_img[..., 2]
    x_idx = u / (pad_w - 1) * (w - 1)
    y_idx = v / (pad_h - 1) * (h - 1)
    z_norm = (dep - depth_min) / (depth_max - depth_min)  # in [0, 1]
    z_idx = z_norm * (d - 1)
    valid2d = (u >= 0) & (u <= pad_w) & (v >= 0) & (v <= pad_h)
    valid = valid2d & (z_norm >= 0) & (z_norm <= 1)
    return jnp.stack([x_idx, y_idx, z_idx], axis=-1), valid2d, valid


def sample_stereo_volume(stereo_vol, coord_img, pad_shape, depth_min,
                         depth_max):
    """Trilinearly sample the (D, H, W, C) stereo volume at voxel
    projections; invalid voxels are zeroed.

    Returns:
        (..., C) samples, valid2d mask, valid (3D) mask.
    """
    idx, valid2d, valid = _frustum_indices(
        coord_img, pad_shape, depth_min, depth_max, stereo_vol.shape[:3])
    out = trilinear_sample(stereo_vol, idx)
    return out * valid[..., None].astype(out.dtype), valid2d, valid


def depth_softmax_lse_map(cost, up_factor, pad_shape, chunk=128):
    """Per-fine-pixel logsumexp over the (virtually) x`up_factor`
    trilinearly-upsampled depth axis.

    Args:
        cost: (D, H, W) single-channel aggregated depth cost.
        up_factor: integer upsample factor (4 for DfM).
        pad_shape: (H_pad, W_pad) fine spatial size (= up_factor * (H, W)).

    Returns:
        (H_pad, W_pad) lse map in f32.
    """
    d, h, w = cost.shape
    h_f, w_f = pad_shape
    d_f = d * up_factor
    wh = interp_matrix(h, h_f, dtype=jnp.float32)       # (H_f, H)
    ww = interp_matrix(w, w_f, dtype=jnp.float32)       # (W_f, W)
    wd = interp_matrix(d, d_f, dtype=jnp.float32)       # (D_f, D)
    cost = cost.astype(jnp.float32)
    # spatial upsample first (x16 data), then chunk the D-upsample + lse
    hp = jax.lax.Precision.HIGHEST
    cost_hw = jnp.einsum('ab,dbw->daw', wh, cost, precision=hp)
    cost_hw = jnp.einsum('cw,daw->dac', ww, cost_hw, precision=hp)

    chunk = min(chunk, w_f)
    num_chunks = w_f // chunk
    cols = cost_hw.reshape(d, h_f, num_chunks, chunk).transpose(2, 0, 1, 3)

    def chunk_lse(col):
        fine = jnp.einsum('fd,dhc->fhc', wd, col, precision=hp)
        return jax.nn.logsumexp(fine, axis=0)

    lse = jax.lax.map(chunk_lse, cols)                  # (num, H_f, chunk)
    return lse.transpose(1, 0, 2).reshape(h_f, w_f)


def sample_upsampled_softmax(cost, lse_map, coord_img, pad_shape, depth_min,
                             depth_max, up_factor=4):
    """Evaluate softmax_D(upsample_x4(cost)) at (u, v, depth) queries —
    exact equivalent of the reference's
    `F.grid_sample(upsample_costs_softmax, norm_coord_imgs)` without
    materializing the upsampled volume.

    The trilinear sample of the softmaxed fine volume expands to
    sum_{8 fine taps} w_tap * exp(F(tap) - lse(tap_hw)), and F at fine
    grid points equals the base interpolant evaluated at the mapped
    base coordinates (nested align-corners linear interpolation).

    Args:
        cost: (D, H, W) base cost.
        lse_map: (H_pad, W_pad) from `depth_softmax_lse_map`.
        coord_img: (..., 3) (u, v, depth) queries.

    Returns:
        (...,) softmax-probability samples (0 outside the frustum).
    """
    d, h, w = cost.shape
    d_f = d * up_factor
    h_f, w_f = pad_shape
    pad_h, pad_w = pad_shape
    u, v, dep = coord_img[..., 0], coord_img[..., 1], coord_img[..., 2]
    # fine-grid indices (same normalization as the reference)
    x_f = u / (pad_w - 1) * (w_f - 1)
    y_f = v / (pad_h - 1) * (h_f - 1)
    z_f = (dep - depth_min) / (depth_max - depth_min) * (d_f - 1)
    valid = ((u >= 0) & (u <= pad_w) & (v >= 0) & (v <= pad_h) &
             (dep >= depth_min) & (dep <= depth_max))

    x0 = jnp.floor(x_f)
    y0 = jnp.floor(y_f)
    z0 = jnp.floor(z_f)
    fx, fy, fz = x_f - x0, y_f - y0, z_f - z0

    # fine integer index -> base (fractional) coordinate
    sx = (w - 1) / (w_f - 1)
    sy = (h - 1) / (h_f - 1)
    sz = (d - 1) / (d_f - 1)
    cost_c = cost[..., None]  # (D, H, W, 1)

    out = 0.
    for dz, wz in ((0, 1 - fz), (1, fz)):
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                xi = jnp.clip(x0 + dx, 0, w_f - 1)
                yi = jnp.clip(y0 + dy, 0, h_f - 1)
                zi = jnp.clip(z0 + dz, 0, d_f - 1)
                base_coord = jnp.stack(
                    [xi * sx, yi * sy, zi * sz], axis=-1)
                f_val = trilinear_sample(cost_c, base_coord)[..., 0]
                lse = lse_map[yi.astype(jnp.int32), xi.astype(jnp.int32)]
                prob = jnp.exp(f_val.astype(jnp.float32) - lse)
                out = out + (wx * wy * wz) * prob
    return jnp.where(valid, out, 0.0)


def sample_sem_features(sem_feat, coord_img, pad_shape, valid2d):
    """Bilinearly sample 2D semantic features at voxel projections
    (reference feature_transformation.py:144-160: depth coord zeroed,
    uv normalized by pad_shape over the sem map).

    Args:
        sem_feat: (Hs, Ws, C) semantic feature map.
        coord_img: (..., 3); only u, v used.
        valid2d: (...,) 2D validity.

    Returns:
        (..., C) samples, zeroed outside the image.
    """
    hs, ws = sem_feat.shape[:2]
    pad_h, pad_w = pad_shape
    u, v = coord_img[..., 0], coord_img[..., 1]
    x_idx = u / (pad_w - 1) * (ws - 1)
    y_idx = v / (pad_h - 1) * (hs - 1)
    out = bilinear_sample(sem_feat, jnp.stack([x_idx, y_idx], axis=-1))
    return out * valid2d[..., None].astype(out.dtype)
