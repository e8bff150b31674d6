"""Tap-packed interpolation: one wide gather instead of 4/8 narrow ones.

TPU gathers are row-count bound (~6 ns per gathered row on v5e,
independent of row width up to 100+ lanes — measured). Bilinear /
trilinear sampling therefore should not issue one gather per tap:
instead the feature map is concatenated with its (+1)-shifted copies
along the channel axis, so ONE row fetch returns all 2^k interpolation
taps, and the weighted combine happens in registers.

Boundary semantics (`padding_mode='zeros'`): the map is padded with one
leading zero row/col per spatial axis before packing (so floor-index -1
exists and its +1 tap reads the true edge value), and the shifted
copies bring zeros in at the far edge; out-of-range taps are also
weight-masked.

This is the XLA-level optimization of the reference's grid_sample
call sites (cost volume, frustum lifting); a Pallas kernel can still
fuse the coordinate math later, but packing alone recovers ~5-10x.
"""

import jax
import jax.numpy as jnp

__all__ = ['pack_taps_2d', 'packed_bilinear_sample', 'pack_taps_3d',
           'packed_trilinear_sample']

# NOTE on optimization_barrier: without it XLA fuses the shift/stack
# table construction INTO the consuming gather, recomputing the packing
# per gathered row (measured: +27 ms on the DfM attention sample, 1.7x
# on the stereo sample). The barrier forces the packed table to be
# materialized once in HBM.


def _shift_minus1(x, axis):
    """x[..., i, ...] -> x[..., i+1, ...] with zero fill at the end."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, 1)
    return jnp.pad(x, pad)[tuple(
        slice(1, None) if a == axis else slice(None)
        for a in range(x.ndim))]


def _lead_pad(x, axes):
    pad = [(0, 0)] * x.ndim
    for a in axes:
        pad[a] = (1, 0)
    return jnp.pad(x, pad)


def pack_taps_2d(feat):
    """(H, W, C) -> (H+1, W+1, 4C):
    row (i, j) holds [f(i-1, j-1), f(i-1, j), f(i, j-1), f(i, j)]
    (i.e. taps (v0, u0), (v0, u0+1), (v0+1, u0), (v0+1, u0+1) for
    floor indices addressed at (v0+1, u0+1)).

    Built as ONE symmetric pad + 4 window slices (not chained
    pad/shift ops, which materialize each intermediate)."""
    h, w, c = feat.shape
    padded = jnp.pad(feat, ((1, 1), (1, 1), (0, 0)))
    taps = [padded[dv:dv + h + 1, du:du + w + 1]
            for dv in (0, 1) for du in (0, 1)]
    # materialize FLAT (rows, lanes): the consuming gather indexes the
    # flattened table, and flattening a (H+1, W+1, 4C) buffer after the
    # fact is a relayout copy (the sublane dim is tile-padded)
    flat = jnp.concatenate(taps, axis=-1).reshape(-1, 4 * c)
    flat = jax.lax.optimization_barrier(flat)
    return flat.reshape(h + 1, w + 1, 4 * c)


def packed_bilinear_sample(packed, coords, c):
    """Bilinear sample from a tap-packed map.

    Args:
        packed: (H+1, W+1, 4C) from `pack_taps_2d`.
        coords: (..., 2) as (x, y) pixel indices into the ORIGINAL map.
        c: channel count C of the original map.

    Returns:
        (..., C); zeros outside (padding_mode='zeros').
    """
    hp, wp = packed.shape[:2]
    h, w = hp - 1, wp - 1
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    vx0 = (x0 >= 0) & (x0 <= w - 1)
    vx1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
    vy0 = (y0 >= 0) & (y0 <= h - 1)
    vy1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)
    # +1: address the lead-padded grid; clip only hits fully-invalid taps
    xi = jnp.clip(x0 + 1, 0, wp - 1).astype(jnp.int32)
    yi = jnp.clip(y0 + 1, 0, hp - 1).astype(jnp.int32)
    rows = jnp.take(packed.reshape(hp * wp, -1), yi * wp + xi, axis=0)
    fx, fy = fx[..., 0], fy[..., 0]
    weights = [((1 - fx) * (1 - fy)) * (vx0 & vy0).astype(fx.dtype),
               (fx * (1 - fy)) * (vx1 & vy0).astype(fx.dtype),
               ((1 - fx) * fy) * (vx0 & vy1).astype(fx.dtype),
               (fx * fy) * (vx1 & vy1).astype(fx.dtype)]
    return _combine_taps(rows, weights, 4, c)


def pack_taps_3d(vol):
    """(D, H, W, C) -> (D+1, H+1, W+1, 8C), taps ordered
    (dz, dy, dx) in {0,1}^3 row-major, addressed at floor+1."""
    d, h, w, c = vol.shape
    padded = jnp.pad(vol, ((1, 1), (1, 1), (1, 1), (0, 0)))
    taps = [padded[dz:dz + d + 1, dy:dy + h + 1, dx:dx + w + 1]
            for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    flat = jnp.concatenate(taps, axis=-1).reshape(-1, 8 * c)
    flat = jax.lax.optimization_barrier(flat)
    return flat.reshape(d + 1, h + 1, w + 1, 8 * c)


def _tap_selector(num_taps, c, dtype):
    """(num_taps*c, num_taps*c) block-diagonal 0/1 matrix mapping packed
    lanes to a (num_taps, c) layout via one MXU matmul."""
    import numpy as np
    s = np.zeros((num_taps * c, num_taps * c), np.float32)
    for t in range(num_taps):
        s[t * c:(t + 1) * c, t * c:(t + 1) * c] = np.eye(c)
    return jnp.asarray(s).astype(dtype)


def _combine_taps(rows, weights, num_taps, c):
    """Weighted tap combine of gathered packed rows.

    rows: (..., num_taps*c); weights: list of num_taps (...)-shaped f32.

    For bf16 rows the per-tap lane slices (offsets c, 2c, ... are not
    128-aligned) are replaced by ONE matmul against a block-diagonal 0/1
    selector — exact for bf16 values and ~2x faster on TPU (measured:
    the slice form costs +13 ms at DfM shapes). f32 rows keep the exact
    slice form (the MXU would round f32 operands to bf16).
    """
    if rows.dtype == jnp.bfloat16:
        sh = rows.shape[:-1]
        sel = jnp.dot(rows.reshape(-1, num_taps * c),
                      _tap_selector(num_taps, c, rows.dtype),
                      preferred_element_type=jnp.float32)
        sel = sel.reshape(-1, num_taps, c)
        wt = jnp.stack([w.reshape(-1) for w in weights], axis=-1)  # (N, T)
        return jnp.einsum('nt,ntc->nc', wt, sel).reshape(sh + (c,))
    out = 0.
    for t in range(num_taps):
        out = out + rows[..., t * c:(t + 1) * c] * \
            weights[t][..., None].astype(rows.dtype)
    return out


def packed_trilinear_sample(packed, coords, c):
    """Trilinear sample from a tap-packed volume.

    Args:
        packed: (D+1, H+1, W+1, 8C) from `pack_taps_3d`.
        coords: (..., 3) as (x, y, z) indices into the ORIGINAL volume.
        c: original channel count.
    """
    dp, hp, wp = packed.shape[:3]
    d, h, w = dp - 1, hp - 1, wp - 1
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0
    xi = jnp.clip(x0 + 1, 0, wp - 1).astype(jnp.int32)
    yi = jnp.clip(y0 + 1, 0, hp - 1).astype(jnp.int32)
    zi = jnp.clip(z0 + 1, 0, dp - 1).astype(jnp.int32)
    rows = jnp.take(packed.reshape(dp * hp * wp, -1),
                    (zi * hp + yi) * wp + xi, axis=0)

    weights = []
    for dz, wz, vz in ((0, 1 - fz, (z0 >= 0) & (z0 <= d - 1)),
                       (1, fz, (z0 + 1 >= 0) & (z0 + 1 <= d - 1))):
        for dy, wy, vy in ((0, 1 - fy, (y0 >= 0) & (y0 <= h - 1)),
                           (1, fy, (y0 + 1 >= 0) & (y0 + 1 <= h - 1))):
            for dx, wx, vx in ((0, 1 - fx, (x0 >= 0) & (x0 <= w - 1)),
                               (1, fx, (x0 + 1 >= 0) & (x0 + 1 <= w - 1))):
                weights.append((wx * wy * wz) *
                               (vx & vy & vz).astype(wx.dtype))
    return _combine_taps(rows, weights, 8, c)
