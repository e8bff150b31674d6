"""Temporal-stereo plane-sweep cost volume (DfM core op).

Rebuilds the *math* of the reference's `build_dfm_cost`
(mmdet3d/models/backbones/dfm_backbone.py:217-314) TPU-first:

* channels-last volumes (B, D, H', W', 2C) so the 3D convs that follow
  map straight onto MXU tiles;
* coordinates stay in pixel units end-to-end (align_corners=True makes
  the [-1,1] normalize/unnormalize a no-op, so it is skipped);
* the augmentation bookkeeping (crop -> scale -> flip undo/redo) is
  carried per sample as arrays, so one jitted program serves every
  sample instead of per-meta python branching;
* sampling is a fused gather (`bilinear_sample`), batched with vmap —
  later replaceable by the Pallas kernel in dfm_tpu.ops.pallas.

Geometry: a (D, H', W') grid of image points x depth hypotheses is
back-projected to the current camera frame, warped into the previous
frame with `cur2prev`, re-projected, and both feature maps are sampled;
the two samples are concatenated along channels.
"""

import jax
import jax.numpy as jnp

from ..core.transforms import homogeneous, points_cam2img, points_img2cam
from .packed_sample import pack_taps_2d, packed_bilinear_sample

__all__ = ['build_plane_sweep_cost', 'plane_sweep_grids']


def plane_sweep_grids(depths,
                      cam2img,
                      cur2prev,
                      feat_shape,
                      cost_sample_factor,
                      feat_sample_factor,
                      org_w,
                      flip,
                      crop_offset,
                      scale_factor):
    """Compute cur/prev sampling grids (pixel coords into the feature map).

    Args:
        depths: (D,) depth hypotheses (downsampled bin centers).
        cam2img: (4, 4) original-image intrinsics.
        cur2prev: (4, 4) cur-cam -> prev-cam transform.
        feat_shape: (h_in, w_in) of the stereo feature maps.
        cost_sample_factor: spatial downsample of the cost grid vs feats.
        feat_sample_factor: feats stride relative to the (augmented) image.
        org_w: traced scalar, pre-augmentation image width (varies per
            KITTI sample; only the width is needed, for flip undo/redo).
        flip: scalar {0., 1.} horizontal-flip indicator.
        crop_offset: (2,) (x, y) crop offset applied during augmentation.
        scale_factor: scalar resize factor applied during augmentation.

    Returns:
        cur_grid, prev_grid: (D, H', W', 2) pixel coords into the
        feature maps (align-corners index space).
    """
    h_in, w_in = feat_shape
    h_out = round(h_in / cost_sample_factor)
    w_out = round(w_in / cost_sample_factor)
    step = feat_sample_factor * cost_sample_factor

    ws = jnp.arange(w_out, dtype=jnp.float32) * step
    hs = jnp.arange(h_out, dtype=jnp.float32) * step
    dd, yy, xx = jnp.meshgrid(depths, hs, ws, indexing='ij')
    grid = jnp.stack([xx, yy, dd], axis=-1)  # (D, H', W', 3) = (u, v, depth)

    # undo augmentation: crop back -> scale back -> flip back
    uv = grid[..., :2] + crop_offset
    uv = uv / scale_factor
    u = jnp.where(flip > 0, org_w - uv[..., 0], uv[..., 0])
    grid = jnp.stack([u, uv[..., 1], grid[..., 2]], axis=-1)

    # back-project to current camera frame
    grid3d = points_img2cam(grid.reshape(-1, 3), cam2img)
    cur_uv = points_cam2img(grid3d, cam2img)
    prev3d = jnp.einsum('nj,kj->nk', homogeneous(grid3d), cur2prev,
                        precision=jax.lax.Precision.HIGHEST)[:, :3]
    prev_uv = points_cam2img(prev3d, cam2img)

    def reapply_aug(uv):
        u = jnp.where(flip > 0, org_w - uv[..., 0], uv[..., 0])
        uv = jnp.stack([u, uv[..., 1]], axis=-1)
        uv = uv * scale_factor - crop_offset
        return uv / feat_sample_factor

    cur_grid = reapply_aug(cur_uv).reshape(depths.shape[0], h_out, w_out, 2)
    prev_grid = reapply_aug(prev_uv).reshape(depths.shape[0], h_out, w_out, 2)
    return cur_grid, prev_grid


def build_plane_sweep_cost(cur_feats,
                           prev_feats,
                           depths,
                           cam2img,
                           cur2prev,
                           cost_sample_factor=4,
                           feat_sample_factor=4,
                           org_w=None,
                           flip=None,
                           crop_offset=None,
                           scale_factor=None,
                           split=False):
    """Plane-sweep cost volume.

    Args:
        cur_feats / prev_feats: (B, H, W, C) stride-`feat_sample_factor`
            stereo features of the current / previous frame.
        depths: (D,) depth hypotheses.
        cam2img: (B, 4, 4) original intrinsics.
        cur2prev: (B, 4, 4).
        org_w: (B,) original image widths (pre-aug); flip: (B,) float
            {0, 1}; crop_offset: (B, 2); scale_factor: (B,).

    Returns:
        (B, D, H', W', 2C) cost volume (cur || prev along channels), or —
        with `split=True` (requires integer cost_sample_factor) — the
        pair (cur2d (B, H', W', C), prev (B, D, H', W', C)) without ever
        materializing the D-constant cur broadcast (the dres stages
        consume it banded, see ops/band_volume.py).
    """
    b = cur_feats.shape[0]
    if org_w is None:
        org_w = jnp.full((b,), float(cur_feats.shape[2] * feat_sample_factor),
                         cur_feats.dtype)
    if flip is None:
        flip = jnp.zeros((b,), cur_feats.dtype)
    if crop_offset is None:
        crop_offset = jnp.zeros((b, 2), cur_feats.dtype)
    if scale_factor is None:
        scale_factor = jnp.ones((b,), cur_feats.dtype)
    feat_shape = cur_feats.shape[1:3]

    c = cur_feats.shape[-1]
    d = depths.shape[0]

    # The cur-frame grid is depth-independent and exactly the strided
    # pixel lattice: the aug undo/redo cancels and img2cam->cam2img with
    # the same camera is the identity, so cur_grid[d, y, x] =
    # (x*csf, y*csf) for every depth (the reference still grid_samples
    # it per depth hypothesis, dfm_backbone.py:296-303 — D x the work).
    # When csf is an integer that sample is a pure slice, broadcast
    # along D; only the prev frame needs real gathers.
    csf = cost_sample_factor
    slice_cur = float(csf) == float(int(csf))
    if split and not slice_cur:
        raise ValueError('split=True needs an integer cost_sample_factor '
                         '(cur sample must be a pure slice)')

    if split:
        h_in, w_in = feat_shape
        h_out = round(h_in / csf)
        w_out = round(w_in / csf)
        cur2d = cur_feats[:, :h_out * int(csf):int(csf),
                          :w_out * int(csf):int(csf)]
        prev_grid = jax.vmap(
            lambda c2i, c2p, ow, fl, co, sf: plane_sweep_grids(
                depths, c2i, c2p, feat_shape, csf, feat_sample_factor,
                ow, fl, co, sf)[1]
        )(cam2img, cur2prev, org_w, flip, crop_offset,
          scale_factor)                            # (B, D, H', W', 2)

        def gather_path(args):
            pf, u, v = args
            grid = jnp.stack([u, v], axis=-1)
            return jax.vmap(
                lambda f, g: packed_bilinear_sample(pack_taps_2d(f), g, c)
            )(pf, grid).astype(pf.dtype)

        u = prev_grid[..., 0]
        v = prev_grid[..., 1]
        import os
        if (cur_feats.dtype == jnp.bfloat16
                and jax.default_backend() == 'tpu'
                and not os.environ.get('DFM_NO_COST_KERNEL')):
            # Pallas band-warp kernel (~5x over the packed gather);
            # per-batch runtime fallback when a row's v-taps exceed
            # the band (ops/pallas/cost_warp.py)
            from .pallas.cost_warp import band_ok, warp_prev_band
            prev_s = jax.lax.cond(
                band_ok(v, prev_feats.shape[1]),
                lambda args: warp_prev_band(*args),
                gather_path, (prev_feats, u, v))
        else:
            prev_s = gather_path((prev_feats, u, v))
        return cur2d, prev_s

    def single(cur_f, prev_f, c2i, c2p, ow, fl, co, sf):
        cur_grid, prev_grid = plane_sweep_grids(
            depths, c2i, c2p, feat_shape, cost_sample_factor,
            feat_sample_factor, ow, fl, co, sf)
        # tap-packed gather: one wide row fetch per query (prev frame)
        prev_s = packed_bilinear_sample(pack_taps_2d(prev_f), prev_grid, c)
        h_out, w_out = prev_grid.shape[1:3]
        if slice_cur:
            cur_s = jnp.broadcast_to(
                cur_f[:h_out * int(csf):int(csf),
                      :w_out * int(csf):int(csf)][None],
                (d, h_out, w_out, c))
        else:
            cur_s = packed_bilinear_sample(pack_taps_2d(cur_f), cur_grid, c)
        return jnp.concatenate([cur_s, prev_s], axis=-1)

    return jax.vmap(single)(cur_feats, prev_feats, cam2img, cur2prev, org_w,
                            flip, crop_offset, scale_factor)
