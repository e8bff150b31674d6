"""Bilinear / trilinear sampling (gather-based, pure JAX).

TPU-native replacement for the reference's pervasive
`F.grid_sample(..., mode='bilinear', padding_mode='zeros',
align_corners=True)` (cost volume: dfm_backbone.py:296-311; frustum
lifting: feature_transformation.py:130-160; point_sample:
fusion_layers/point_fusion.py:90).

Unlike torch's normalized [-1, 1] grids, these take *pixel/voxel index*
coordinates directly — with align_corners=True the normalize/unnormalize
round-trip is the identity, so callers skip it and keep full precision.
Out-of-range taps contribute zero (padding_mode='zeros').
"""

import jax.numpy as jnp

__all__ = ['bilinear_sample', 'trilinear_sample',
           'normalized_to_index', 'index_to_normalized']


def normalized_to_index(g, size):
    """[-1, 1] align-corners grid coordinate -> array index."""
    return (g + 1.0) * 0.5 * (size - 1)


def index_to_normalized(idx, size):
    """Array index -> [-1, 1] align-corners grid coordinate."""
    return idx / (size - 1) * 2.0 - 1.0


def bilinear_sample(feat, coords):
    """Sample a (H, W, C) feature map at float pixel coords.

    Args:
        feat: (H, W, C).
        coords: (..., 2) as (x, y) pixel indices.

    Returns:
        (..., C) samples; taps outside the map contribute 0.
    """
    h, w, c = feat.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    flat = feat.reshape(h * w, c)

    out = 0.
    for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
            xi = x0 + dx
            yi = y0 + dy
            valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            vals = jnp.take(flat, yi_c * w + xi_c, axis=0)
            wgt = (wx * wy * valid.astype(feat.dtype))[..., None]
            out = out + wgt * vals
    return out


def trilinear_sample(vol, coords):
    """Sample a (D, H, W, C) volume at float (x, y, z) = (w, h, d) coords.

    Args:
        vol: (D, H, W, C).
        coords: (..., 3) as (x, y, z) indices into (W, H, D).

    Returns:
        (..., C); out-of-range taps contribute 0.
    """
    d, h, w, c = vol.shape
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0
    flat = vol.reshape(d * h * w, c)

    out = 0.
    for dz, wz in ((0, 1 - fz), (1, fz)):
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                xi = x0 + dx
                yi = y0 + dy
                zi = z0 + dz
                valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) &
                         (yi <= h - 1) & (zi >= 0) & (zi <= d - 1))
                xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
                yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
                zi_c = jnp.clip(zi, 0, d - 1).astype(jnp.int32)
                idx = (zi_c * h + yi_c) * w + xi_c
                vals = jnp.take(flat, idx, axis=0)
                wgt = (wx * wy * wz * valid.astype(vol.dtype))[..., None]
                out = out + wgt * vals
    return out
