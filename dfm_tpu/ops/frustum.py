"""Frustum -> voxel lifting ops (DfM feature transformation).

Rebuilds the math of the reference's `FrustumToVoxel.forward`
(mmdet3d/models/necks/feature_transformation.py:68-173) TPU-first:

* voxel-center projection + validity masks are computed per sample from
  the (augmented) intrinsics, all static shapes;
* all sampling uses tap-packed gathers (one wide row fetch per query,
  see dfm_tpu.ops.packed_sample) — TPU gathers are row-count bound;
* the reference samples a softmax over the x4 trilinearly-upsampled
  cost volume (~0.5 GB materialized f32 on GPU). Two exact TPU
  formulations are provided:
    - `depth_softmax_lse_map` + `sample_upsampled_softmax`: never
      materializes the fine volume (logsumexp map + base-interpolant
      evaluation) — minimal memory, more gathers;
    - `build_packed_fine_softmax` + `sample_fine_softmax_packed`:
      materializes the softmaxed fine volume once in bf16 with hw-tap
      packing — 2 gathers per voxel query, used on the hot path.
  Both equal torch's explicit upsample->softmax->grid_sample exactly
  (nested align-corners linear interpolation is the base interpolant).
"""

import jax
import jax.numpy as jnp

from ..core.boxes import pseudo_lidar_to_cam_points
from ..core.transforms import points_cam2img
from .grid_sample import bilinear_sample, trilinear_sample
from .packed_sample import (pack_taps_2d, pack_taps_3d,
                            packed_bilinear_sample, packed_trilinear_sample)
from .resize import interp_matrix

__all__ = ['project_voxels_to_frustum', 'sample_stereo_volume',
           'sample_stereo_volume_packed', 'depth_softmax_lse_map',
           'sample_upsampled_softmax', 'build_packed_fine_softmax',
           'sample_fine_softmax_packed', 'sample_sem_features',
           'sample_sem_features_packed']


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
    """Reference-formulation trilinear sample (unpacked; kept for tests).

    Returns:
        (..., C) samples, valid2d mask, valid (3D) mask.
    """
    idx, valid2d, valid = _frustum_indices(
        coord_img, pad_shape, depth_min, depth_max, stereo_vol.shape[:3])
    out = trilinear_sample(stereo_vol, idx)
    return out * valid[..., None].astype(out.dtype), valid2d, valid


def sample_stereo_volume_packed(packed_vol, c, coord_img, pad_shape,
                                depth_min, depth_max):
    """Trilinear sample from a `pack_taps_3d`-packed stereo volume:
    one wide gather per voxel."""
    # packed is (D+1, H+1, W+1, 8C): normalize by the ORIGINAL shape
    d, h, w = (s - 1 for s in packed_vol.shape[:3])
    idx, valid2d, valid = _frustum_indices(
        coord_img, pad_shape, depth_min, depth_max, (d, h, w))
    out = packed_trilinear_sample(packed_vol, idx, c)
    return out * valid[..., None].astype(out.dtype), valid2d, valid


def _upsample_hw(cost, pad_shape):
    """(D, H, W) -> (D, H_f, W_f) align-corners bilinear via matmuls."""
    d, h, w = cost.shape
    h_f, w_f = pad_shape
    hp = jax.lax.Precision.HIGHEST
    wh = interp_matrix(h, h_f, dtype=jnp.float32)
    ww = interp_matrix(w, w_f, dtype=jnp.float32)
    cost_hw = jnp.einsum('ab,dbw->daw', wh, cost.astype(jnp.float32),
                         precision=hp)
    return jnp.einsum('cw,daw->dac', ww, cost_hw, precision=hp)


def depth_softmax_lse_map(cost, up_factor, pad_shape, chunk=None,
                          cost_hw=None):
    """Per-fine-pixel logsumexp over the (virtually) x`up_factor`
    trilinearly-upsampled depth axis.

    Args:
        cost: (D, H, W) single-channel aggregated depth cost.
        up_factor: integer upsample factor (4 for DfM).
        pad_shape: (H_pad, W_pad) fine spatial size (= up_factor * (H, W)).
        cost_hw: optional precomputed hw-upsampled cost (shared with
            `build_packed_fine_softmax`).

    Returns:
        (H_pad, W_pad) lse map in f32.
    """
    d = cost.shape[0]
    h_f, w_f = pad_shape
    d_f = d * up_factor
    if cost_hw is None:
        cost_hw = _upsample_hw(cost, pad_shape)
    wd = interp_matrix(d, d_f, dtype=jnp.float32)       # (D_f, D)
    hp = jax.lax.Precision.HIGHEST
    fine = jnp.einsum('fd,dhw->fhw', wd, cost_hw, precision=hp)
    return jax.nn.logsumexp(fine, axis=0)


def build_packed_fine_softmax(cost, up_factor, pad_shape,
                              dtype=jnp.bfloat16, kd_chunk=None):
    """Materialize softmax_D(upsample(cost)) on the fine grid, hw-tap
    packed: (D_f, H_f+1, W_f+1, 4) in `dtype` (lead-padded).

    The hw-upsampled cost is shared with the lse computation; everything
    is a handful of MXU matmuls + one exp pass. (Packing the kd taps too
    was measured SLOWER: the 2x larger table thrashes, 92 -> 152 ms.)
    """
    d, h, w = cost.shape
    h_f, w_f = pad_shape
    d_f = d * up_factor
    cost_hw = _upsample_hw(cost, pad_shape)
    lse = depth_softmax_lse_map(cost, up_factor, pad_shape,
                                cost_hw=cost_hw)
    hp = jax.lax.Precision.HIGHEST
    wd = interp_matrix(d, d_f, dtype=jnp.float32)
    from .packed_sample import _lead_pad, _shift_minus1
    fine = jnp.einsum('fd,dhw->fhw', wd, cost_hw, precision=hp)
    sm = jnp.exp(fine - lse[None]).astype(dtype)        # (D_f, H_f, W_f)
    sm = _lead_pad(sm, (1, 2))
    su = _shift_minus1(sm, 2)
    sv = _shift_minus1(sm, 1)
    svu = _shift_minus1(sv, 2)
    return jnp.stack([sm, su, sv, svu], axis=-1)


def sample_fine_softmax_packed(packed_fine, coord_img, pad_shape, depth_min,
                               depth_max, up_factor=4):
    """Sample the packed fine softmax volume at (u, v, depth) queries —
    exact equivalent of the reference's
    `F.grid_sample(upsample_costs_softmax, norm_coord_imgs)`.

    Two packed gathers per query (kd floor/ceil)."""
    d_f, hp_, wp_ = packed_fine.shape[:3]
    h_f, w_f = hp_ - 1, wp_ - 1
    pad_h, pad_w = pad_shape
    u, v, dep = coord_img[..., 0], coord_img[..., 1], coord_img[..., 2]
    x_f = u / (pad_w - 1) * (w_f - 1)
    y_f = v / (pad_h - 1) * (h_f - 1)
    z_f = (dep - depth_min) / (depth_max - depth_min) * (d_f - 1)
    valid = ((u >= 0) & (u <= pad_w) & (v >= 0) & (v <= pad_h) &
             (dep >= depth_min) & (dep <= depth_max))

    z0 = jnp.floor(z_f)
    fz = z_f - z0
    zi0 = jnp.clip(z0, 0, d_f - 1).astype(jnp.int32)
    zi1 = jnp.clip(z0 + 1, 0, d_f - 1).astype(jnp.int32)
    xy = jnp.stack([x_f, y_f], axis=-1)

    def slice_sample(zi):
        # gather the packed row at (zi, y0+1, x0+1) in the lead-padded grid
        x0 = jnp.floor(x_f)
        y0 = jnp.floor(y_f)
        fx = (x_f - x0)[..., None]
        fy = (y_f - y0)[..., None]
        vx0 = (x0 >= 0) & (x0 <= w_f - 1)
        vx1 = (x0 + 1 <= w_f - 1) & (x0 + 1 >= 0)
        vy0 = (y0 >= 0) & (y0 <= h_f - 1)
        vy1 = (y0 + 1 <= h_f - 1) & (y0 + 1 >= 0)
        xi = jnp.clip(x0 + 1, 0, wp_ - 1).astype(jnp.int32)
        yi = jnp.clip(y0 + 1, 0, hp_ - 1).astype(jnp.int32)
        rows = jnp.take(packed_fine.reshape(d_f * hp_ * wp_, 4),
                        (zi * hp_ + yi) * wp_ + xi, axis=0)
        rows = rows.astype(jnp.float32)
        w00 = (1 - fx[..., 0]) * (1 - fy[..., 0]) * (vx0 & vy0)
        w01 = fx[..., 0] * (1 - fy[..., 0]) * (vx1 & vy0)
        w10 = (1 - fx[..., 0]) * fy[..., 0] * (vx0 & vy1)
        w11 = fx[..., 0] * fy[..., 0] * (vx1 & vy1)
        return (rows[..., 0] * w00 + rows[..., 1] * w01 +
                rows[..., 2] * w10 + rows[..., 3] * w11)

    s0 = slice_sample(zi0)
    s1 = slice_sample(zi1)
    vz0 = (z0 >= 0) & (z0 <= d_f - 1)
    vz1 = (z0 + 1 >= 0) & (z0 + 1 <= d_f - 1)
    out = s0 * (1 - fz) * vz0 + s1 * fz * vz1
    del xy
    return jnp.where(valid, out, 0.0)


def sample_upsampled_softmax(cost, lse_map, coord_img, pad_shape, depth_min,
                             depth_max, up_factor=4):
    """Memory-minimal exact formulation (no fine volume): evaluate
    softmax_D(upsample(cost)) per query via the lse map.

    sum_{8 fine taps} w_tap * exp(F(tap) - lse(tap_hw)), F at fine grid
    points = base interpolant at mapped coordinates."""
    d, h, w = cost.shape
    d_f = d * up_factor
    h_f, w_f = pad_shape
    pad_h, pad_w = pad_shape
    u, v, dep = coord_img[..., 0], coord_img[..., 1], coord_img[..., 2]
    x_f = u / (pad_w - 1) * (w_f - 1)
    y_f = v / (pad_h - 1) * (h_f - 1)
    z_f = (dep - depth_min) / (depth_max - depth_min) * (d_f - 1)
    valid = ((u >= 0) & (u <= pad_w) & (v >= 0) & (v <= pad_h) &
             (dep >= depth_min) & (dep <= depth_max))

    x0 = jnp.floor(x_f)
    y0 = jnp.floor(y_f)
    z0 = jnp.floor(z_f)
    fx, fy, fz = x_f - x0, y_f - y0, z_f - z0

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
    """Unpacked sem-feature sampling (kept for tests)."""
    hs, ws = sem_feat.shape[:2]
    pad_h, pad_w = pad_shape
    u, v = coord_img[..., 0], coord_img[..., 1]
    x_idx = u / (pad_w - 1) * (ws - 1)
    y_idx = v / (pad_h - 1) * (hs - 1)
    out = bilinear_sample(sem_feat, jnp.stack([x_idx, y_idx], axis=-1))
    return out * valid2d[..., None].astype(out.dtype)


def sample_sem_features_packed(packed_sem, c, coord_img, pad_shape, valid2d):
    """Tap-packed sem-feature sampling (reference
    feature_transformation.py:144-160: depth coord zeroed, uv
    normalized by pad_shape)."""
    # packed is (H+1, W+1, 4C): normalize by the ORIGINAL shape
    hs, ws = (s - 1 for s in packed_sem.shape[:2])
    pad_h, pad_w = pad_shape
    u, v = coord_img[..., 0], coord_img[..., 1]
    x_idx = u / (pad_w - 1) * (ws - 1)
    y_idx = v / (pad_h - 1) * (hs - 1)
    out = packed_bilinear_sample(
        packed_sem, jnp.stack([x_idx, y_idx], axis=-1), c)
    return out * valid2d[..., None].astype(out.dtype)


def build_base27_tables(cost, up_factor, pad_shape, dtype=jnp.float32,
                        pad_lanes=None):
    """Tables for the base27 samplers: the 3^3-corner-packed BASE cost
    volume (D, H, W, 27 [padded to `pad_lanes`]) and the 4-tap-packed
    fine lse map (H_f, W_f, 4).

    All 8 fine interpolation taps of one voxel query read base corners
    within a 3x3x3 neighborhood (fine spacing = ~1/4 base cell), so ONE
    row of the 27-packed table serves a whole query; the fine volume is
    never built.

    MEASURED v5e gather regimes (ns/row, 1.75M random rows): rows of
    <=16 BYTES ~4.3; rows of >=64 LANES ~11; anything between is 2-4x
    slower (27-lane bf16: 24.5, 32-lane f32: 37.5). Hence the hot path
    pads base27 to 64 bf16 lanes and keeps lse4 at 4 f32 lanes.
    """
    from .packed_sample import _shift_minus1
    lse = depth_softmax_lse_map(cost, up_factor, pad_shape)
    # 4-tap-packed lse (no lead pad needed: fine indices are >= 0)
    l_u = _shift_minus1(lse, 1)
    l_v = _shift_minus1(lse, 0)
    l_vu = _shift_minus1(l_v, 1)
    lse4 = jnp.stack([lse, l_u, l_v, l_vu], axis=-1)

    base = cost.astype(dtype)
    outs = []
    sz = base
    for dz in range(3):
        sy = sz
        for dy in range(3):
            sx = sy
            for dx in range(3):
                outs.append(sx)
                sx = _shift_minus1(sx, 2)
            sy = _shift_minus1(sy, 1)
        sz = _shift_minus1(sz, 0)
    base27 = jnp.stack(outs, axis=-1)   # (D, H, W, 27)
    if pad_lanes is not None and pad_lanes > 27:
        base27 = jnp.pad(base27, [(0, 0)] * 3 + [(0, pad_lanes - 27)])
    # barrier: stop XLA fusing the 27-shift construction into the
    # consuming gather (it would recompute the packing per row: +27 ms)
    return jax.lax.optimization_barrier((base27, lse4))


def sample_softmax_base27_hat(base27, lse4, coord_img, pad_shape,
                              depth_min, depth_max, up_factor=4):
    """Exact softmax(upsample(cost)) sampling — hat-weight formulation.

    Same math as `sample_softmax_base27` (2 gathers per query from the
    SMALL base27/lse4 tables) but the per-corner dynamic lane indexing
    (take_along_axis, which XLA lowers catastrophically on TPU: 2.3 s)
    is replaced by hat-function weights: linear interpolation over the
    3-node-per-axis neighborhood is exactly

        F(tap) = sum_{a,b,c in 0..2} hat(pz-a) hat(py-b) hat(px-c)
                                     * rows27[a*9 + b*3 + c],
        hat(t) = max(0, 1 - |t|),

    because every tap's base coordinate stays within [node0, node2]
    (fine spacing = base/up_factor <= 1). Pure vectorized VPU math.

    This is the hot attention-sampler path: the tables total ~100 MB
    (vs the 950 MB packed fine volume), so the gathers run at the
    small-table rate, and no fine softmax volume is ever materialized.
    """
    d, h, w = base27.shape[:3]
    h_f, w_f = lse4.shape[:2]
    d_f = d * up_factor
    pad_h, pad_w = pad_shape
    u, v, dep = coord_img[..., 0], coord_img[..., 1], coord_img[..., 2]
    x_f = u / (pad_w - 1) * (w_f - 1)
    y_f = v / (pad_h - 1) * (h_f - 1)
    z_f = (dep - depth_min) / (depth_max - depth_min) * (d_f - 1)
    valid = ((u >= 0) & (u <= pad_w) & (v >= 0) & (v <= pad_h) &
             (dep >= depth_min) & (dep <= depth_max))

    x0 = jnp.floor(x_f)
    y0 = jnp.floor(y_f)
    z0 = jnp.floor(z_f)
    fx, fy, fz = x_f - x0, y_f - y0, z_f - z0
    xi0 = jnp.clip(x0, 0, w_f - 1).astype(jnp.int32)
    yi0 = jnp.clip(y0, 0, h_f - 1).astype(jnp.int32)
    zi0 = jnp.clip(z0, 0, d_f - 1).astype(jnp.int32)

    sx = (w - 1) / (w_f - 1)
    sy = (h - 1) / (h_f - 1)
    sz = (d - 1) / (d_f - 1)

    bx0 = jnp.floor(xi0.astype(jnp.float32) * sx)
    by0 = jnp.floor(yi0.astype(jnp.float32) * sy)
    bz0 = jnp.floor(zi0.astype(jnp.float32) * sz)
    rows27 = jnp.take(
        base27.reshape(d * h * w, base27.shape[-1]),
        (bz0.astype(jnp.int32) * h + by0.astype(jnp.int32)) * w +
        bx0.astype(jnp.int32), axis=0).astype(jnp.float32)   # (..., 27)
    lrows = jnp.take(
        lse4.reshape(h_f * w_f, 4),
        yi0 * w_f + xi0, axis=0).astype(jnp.float32)          # (..., 4)

    def hat3(p):
        """(...,) -> (..., 3) hat weights at nodes 0, 1, 2."""
        n = jnp.arange(3, dtype=p.dtype)
        return jnp.maximum(0.0, 1.0 - jnp.abs(p[..., None] - n))

    def axis_w(i_fine, scale, b0):
        """3-node weights of one tap's base coordinate along one axis."""
        return hat3(i_fine.astype(jnp.float32) * scale - b0)

    # per-axis fine tap indices (0/+1, clipped as the fine grid does)
    xt = [jnp.clip(x0, 0, w_f - 1), jnp.clip(x0 + 1, 0, w_f - 1)]
    yt = [jnp.clip(y0, 0, h_f - 1), jnp.clip(y0 + 1, 0, h_f - 1)]
    zt = [jnp.clip(z0, 0, d_f - 1), jnp.clip(z0 + 1, 0, d_f - 1)]
    wx3 = [axis_w(t, sx, bx0) for t in xt]   # each (..., 3)
    wy3 = [axis_w(t, sy, by0) for t in yt]
    wz3 = [axis_w(t, sz, bz0) for t in zt]

    vz = [(z0 >= 0) & (z0 <= d_f - 1), (z0 + 1 >= 0) & (z0 + 1 <= d_f - 1)]
    vy = [(y0 >= 0) & (y0 <= h_f - 1), (y0 + 1 >= 0) & (y0 + 1 <= h_f - 1)]
    vx = [(x0 >= 0) & (x0 <= w_f - 1), (x0 + 1 >= 0) & (x0 + 1 <= w_f - 1)]
    wz_f = [1 - fz, fz]
    wy_f = [1 - fy, fy]
    wx_f = [1 - fx, fx]

    # separable contraction over the 3x3x3 lanes (x, then y, then z):
    # 114 FMA/query instead of 8 taps x (27 build + 27 mult + reduce)
    r3 = rows27[..., :27].reshape(rows27.shape[:-1] + (3, 3, 3))  # (z,y,x)
    tx = [jnp.sum(r3 * wx3[dx][..., None, None, :], axis=-1)
          for dx in (0, 1)]                                  # (..., 3z, 3y)
    out = 0.
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ty = jnp.sum(tx[dx] * wy3[dy][..., None, :], axis=-1)
                f_val = jnp.sum(ty * wz3[dz], axis=-1)
                lse = lrows[..., dy * 2 + dx]
                # clamp: an invalid tap can read a zero-filled lse and
                # overflow exp; the weight masks it, but inf * 0 = nan
                prob = jnp.exp(jnp.minimum(f_val - lse, 60.0))
                wt = (wx_f[dx] * wy_f[dy] * wz_f[dz] *
                      (vx[dx] & vy[dy] & vz[dz]))
                out = out + wt * prob
    return jnp.where(valid, out, 0.0)


def sample_softmax_base27(base27, lse4, coord_img, pad_shape, depth_min,
                          depth_max, up_factor=4):
    """Exact softmax(upsample(cost)) sampling with 2 gathers per query
    from small tables (see `build_base27_tables`)."""
    d, h, w = base27.shape[:3]
    h_f, w_f = lse4.shape[:2]
    d_f = d * up_factor
    pad_h, pad_w = pad_shape
    u, v, dep = coord_img[..., 0], coord_img[..., 1], coord_img[..., 2]
    x_f = u / (pad_w - 1) * (w_f - 1)
    y_f = v / (pad_h - 1) * (h_f - 1)
    z_f = (dep - depth_min) / (depth_max - depth_min) * (d_f - 1)
    valid = ((u >= 0) & (u <= pad_w) & (v >= 0) & (v <= pad_h) &
             (dep >= depth_min) & (dep <= depth_max))

    x0 = jnp.floor(x_f)
    y0 = jnp.floor(y_f)
    z0 = jnp.floor(z_f)
    fx, fy, fz = x_f - x0, y_f - y0, z_f - z0
    xi0 = jnp.clip(x0, 0, w_f - 1).astype(jnp.int32)
    yi0 = jnp.clip(y0, 0, h_f - 1).astype(jnp.int32)
    zi0 = jnp.clip(z0, 0, d_f - 1).astype(jnp.int32)

    # fine->base coordinate scales (align-corners)
    sx = (w - 1) / (w_f - 1)
    sy = (h - 1) / (h_f - 1)
    sz = (d - 1) / (d_f - 1)

    # shared base corner origin of all 8 fine taps
    bx0 = jnp.floor(xi0.astype(jnp.float32) * sx)
    by0 = jnp.floor(yi0.astype(jnp.float32) * sy)
    bz0 = jnp.floor(zi0.astype(jnp.float32) * sz)
    rows27 = jnp.take(
        base27.reshape(d * h * w, 27),
        (bz0.astype(jnp.int32) * h + by0.astype(jnp.int32)) * w +
        bx0.astype(jnp.int32), axis=0)                    # (..., 27)
    lrows = jnp.take(
        lse4.reshape(h_f * w_f, 4),
        yi0 * w_f + xi0, axis=0)                           # (..., 4)

    def base_tri(zi, yi, xi):
        """F at a fine-integer tap via trilinear of the gathered 27."""
        bx = xi.astype(jnp.float32) * sx
        by = yi.astype(jnp.float32) * sy
        bz = zi.astype(jnp.float32) * sz
        ax0 = jnp.floor(bx) - bx0   # in {0, 1}
        ay0 = jnp.floor(by) - by0
        az0 = jnp.floor(bz) - bz0
        gx, gy, gz = bx - jnp.floor(bx), by - jnp.floor(by), \
            bz - jnp.floor(bz)
        val = 0.
        for oz, wz in ((0, 1 - gz), (1, gz)):
            for oy, wy in ((0, 1 - gy), (1, gy)):
                for ox, wx in ((0, 1 - gx), (1, gx)):
                    idx = ((az0 + oz) * 3 + (ay0 + oy)) * 3 + (ax0 + ox)
                    sel = jnp.take_along_axis(
                        rows27, idx.astype(jnp.int32)[..., None],
                        axis=-1)[..., 0]
                    val = val + (wx * wy * wz) * sel.astype(jnp.float32)
        return val

    out = 0.
    for dz, wz, vz in ((0, 1 - fz, (z0 >= 0) & (z0 <= d_f - 1)),
                       (1, fz, (z0 + 1 >= 0) & (z0 + 1 <= d_f - 1))):
        zi = jnp.clip(z0 + dz, 0, d_f - 1).astype(jnp.int32)
        for tap_i, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            wy = (1 - fy) if dy == 0 else fy
            wx = (1 - fx) if dx == 0 else fx
            vy = (y0 + dy >= 0) & (y0 + dy <= h_f - 1)
            vx = (x0 + dx >= 0) & (x0 + dx <= w_f - 1)
            yi = jnp.clip(y0 + dy, 0, h_f - 1).astype(jnp.int32)
            xi = jnp.clip(x0 + dx, 0, w_f - 1).astype(jnp.int32)
            f_val = base_tri(zi, yi, xi)
            lse = lrows[..., tap_i].astype(jnp.float32)
            prob = jnp.exp(f_val - lse)
            out = out + (wx * wy * wz) * (vx & vy & vz) * prob
    return jnp.where(valid, out, 0.0)


def voxel_sample(volume, depth_samples, proj_mat, downsample_factor,
                 pad_shape, img_shape=None, scale_factor=None,
                 crop_offset=None, flip=None, voxel_range=None,
                 voxel_size=None):
    """Sample a voxel feature volume on a camera frustum grid.

    Equivalent of the reference's `voxel_sample`
    (fusion_layers/point_fusion.py:324-412): builds a
    (D', H_out, W_out) grid of (u, v, depth) image points, undoes the
    augmentation (flip -> crop -> scale), back-projects with the
    ORIGINAL lidar2img matrix, converts to voxel-grid coordinates
    (AlignedAnchor convention: -0.5 cell-center offset) and samples the
    volume trilinearly (align-corners on the normalized cube, matching
    F.grid_sample semantics).

    Args:
        volume: (Nz, Ny, Nx, C) voxel features (z-major, channels-last;
            the reference uses (1, C, Nx, Ny, Nz)).
        depth_samples: (D,) full-resolution depth bin centers; strided
            by `downsample_factor` like the reference.
        proj_mat: (4, 4) original lidar2img.
        pad_shape: (H_pad, W_pad) padded image size defining the grid.
        img_shape: (h, w) pre-pad shape used for flip undo.
        voxel_range: (6,) (x0, y0, z0, x1, y1, z1).
        voxel_size: (3,) voxel edge lengths.

    Returns:
        (D', H_out, W_out, C) frustum features.
    """
    h, w = pad_shape
    h_out = round(h / downsample_factor)
    w_out = round(w / downsample_factor)
    ws = jnp.arange(w_out, dtype=jnp.float32) * downsample_factor
    hs = jnp.arange(h_out, dtype=jnp.float32) * downsample_factor
    depths = jnp.asarray(depth_samples)[::downsample_factor]
    dd, yy, xx = jnp.meshgrid(depths, hs, ws, indexing='ij')
    grid = jnp.stack([xx, yy, dd], axis=-1)       # (D', H', W', 3)

    u = grid[..., 0]
    if flip is not None and img_shape is not None:
        u = jnp.where(flip > 0, img_shape[1] - u, u)
    uv = jnp.stack([u, grid[..., 1]], axis=-1)
    if crop_offset is not None:
        uv = uv + crop_offset
    if scale_factor is not None:
        uv = uv / scale_factor
    pts = jnp.concatenate([uv, grid[..., 2:3]], axis=-1)

    from ..core.transforms import points_img2cam
    grid3d = points_img2cam(pts.reshape(-1, 3), proj_mat)  # lidar frame
    vr = jnp.asarray(voxel_range, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    idx = (grid3d - vr[:3]) / vs - 0.5            # (P, 3) x, y, z voxel idx
    nz, ny, nx = volume.shape[:3]
    # grid_sample normalized-cube -> align-corners index space of the
    # STATIC grid extent (reference normalizes by (range/size), i.e. the
    # number of voxels, then maps [-1, 1] onto [0, n-1])
    n3 = jnp.stack([jnp.float32(nx), jnp.float32(ny), jnp.float32(nz)])
    norm = idx / n3 * 2 - 1                        # (-1, 1) cube
    coords = (norm + 1) / 2 * (n3 - 1)             # align-corners indices
    out = trilinear_sample(volume, coords.reshape(grid.shape[:3] + (3,)))
    return out
