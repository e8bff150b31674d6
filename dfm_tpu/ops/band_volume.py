"""Depth-banded volumes: exact shortcuts for D-constant cost slabs.

The DfM cost volume's CUR half is constant along the depth axis (the
cur-frame grid is depth-independent — see ops/cost_volume.py), so the
mono branch of DfMBackbone convolves a volume whose slices are all
equal, and the stereo dres0 convolves [cur || prev] whose first half
is D-constant. A 3^3 conv of a D-constant volume equals ONE 2D conv
with the z-summed kernel, broadcast along D, except within a growing
edge band (one slice per conv) where the zero z-padding shows.

`BandVol` stores (interior 2D slice, lo/hi edge bands of width E) and
supports the exact ops the dres stages need: 3D conv (E grows by 1),
GroupNorm (stats composed from the parts), relu, add. At DfM shapes
this turns the two mono dres convs (~21 ms of dense 3D conv) into 2D
convs + edge fixups (~2 ms), exactly.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ['BandVol', 'band_from_const', 'band_conv3', 'band_gn',
           'band_relu', 'band_add', 'band_to_dense', 'dual_conv3']


class BandVol(NamedTuple):
    interior: jnp.ndarray    # (B, H, W, C) — slices E..D-E-1 all equal
    lo: jnp.ndarray          # (B, E, H, W, C)
    hi: jnp.ndarray          # (B, E, H, W, C)
    d: int                   # total depth


def band_from_const(x2d, d):
    """A fully D-constant volume (edge width 0)."""
    b, h, w, c = x2d.shape
    e = jnp.zeros((b, 0, h, w, c), x2d.dtype)
    return BandVol(x2d, e, e, d)


def band_to_dense(bv: BandVol):
    b, h, w, c = bv.interior.shape
    e = bv.lo.shape[1]
    mid = jnp.broadcast_to(bv.interior[:, None],
                           (b, bv.d - 2 * e, h, w, c))
    return jnp.concatenate([bv.lo, mid, bv.hi], axis=1)


def _conv2d(x, k2d):
    return jax.lax.conv_general_dilated(
        x, k2d, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _conv3d(x, k):
    """3x3x3 SAME conv via the W-group lane packing when eligible
    (layers._wgroup_conv3d: exact, full MXU lanes — C32 3.9 ms vs
    zsum 4.4 vs direct 7.0 at DfM shapes), else z-shifted 2D convs."""
    b, d, h, w, cin = x.shape
    if x.dtype == jnp.bfloat16 and 64 <= cin <= 64 and w % 2 == 0:
        from ..models.layers import _wgroup_conv3d
        return _wgroup_conv3d(x, k.astype(x.dtype), 2)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(3):
        flat = xp[:, dz:dz + d].reshape(b * d, h, w, cin)
        o = jax.lax.conv_general_dilated(
            flat, k[dz], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        out = o if out is None else out + o
    return out.astype(x.dtype).reshape(b, d, h, w, k.shape[-1])


def band_conv3(bv: BandVol, kernel):
    """3x3x3 SAME conv of a banded volume; edge width grows by 1.

    kernel: (3, 3, 3, C_in, C_out).
    """
    e = bv.lo.shape[1]
    k_sum = kernel.sum(axis=0)                   # (3, 3, C_in, C_out)
    interior = _conv2d(bv.interior, k_sum.astype(bv.interior.dtype))
    # edge outputs d = 0..E: need input slices 0..E+1 = lo + 2 interior
    pad_in = jnp.concatenate(
        [bv.lo, jnp.broadcast_to(bv.interior[:, None],
                                 bv.interior.shape[:1] + (2,) +
                                 bv.interior.shape[1:])], axis=1)
    lo_full = _conv3d(pad_in, kernel.astype(bv.interior.dtype))
    # conv3d SAME on (E+2) slices: slice outputs 0..E are exact (they
    # see the true zero pad below and real values above); keep E+1
    lo = lo_full[:, :e + 1]
    hi_in = jnp.concatenate(
        [jnp.broadcast_to(bv.interior[:, None],
                          bv.interior.shape[:1] + (2,) +
                          bv.interior.shape[1:]), bv.hi], axis=1)
    hi_full = _conv3d(hi_in, kernel.astype(bv.interior.dtype))
    hi = hi_full[:, -(e + 1):]
    return BandVol(interior, lo, hi, bv.d)


def band_gn(bv: BandVol, scale, bias, num_groups, eps=1e-5):
    """GroupNorm over (D, H, W, C/group) with stats composed exactly
    from (interior x (D - 2E) + lo + hi)."""
    b, h, w, c = bv.interior.shape
    e = bv.lo.shape[1]
    g = num_groups
    n_int = bv.d - 2 * e

    def moments(x, cnt):
        # x: (..., H, W, C) reshaped to groups; returns per (B, g) sums
        xx = x.reshape(b, -1, h, w, g, c // g).astype(jnp.float32)
        s = xx.sum(axis=(1, 2, 3, 5))
        s2 = (xx * xx).sum(axis=(1, 2, 3, 5))
        return s, s2

    si, si2 = moments(bv.interior[:, None], 1)
    sl, sl2 = moments(bv.lo, e) if e else (0.0, 0.0)
    sh, sh2 = moments(bv.hi, e) if e else (0.0, 0.0)
    cnt = bv.d * h * w * (c // g)
    s = si * n_int + sl + sh
    s2 = si2 * n_int + sl2 + sh2
    mean = s / cnt
    var = s2 / cnt - mean**2
    inv = jax.lax.rsqrt(var + eps)               # (B, g)

    # fold into one scale/bias apply per element (f32, cast on store)
    sc = (jnp.asarray(scale, jnp.float32).reshape(g, c // g) *
          inv[..., None]).reshape(b, c)
    bs = (jnp.asarray(bias, jnp.float32).reshape(g, c // g) -
          mean[..., None] * jnp.asarray(scale, jnp.float32
                                        ).reshape(g, c // g) *
          inv[..., None]).reshape(b, c)

    def norm(x):
        shape = (b,) + (1,) * (x.ndim - 2) + (c,)
        return (x.astype(jnp.float32) * sc.reshape(shape) +
                bs.reshape(shape)).astype(x.dtype)

    return BandVol(norm(bv.interior), norm(bv.lo), norm(bv.hi), bv.d)


def band_relu(bv: BandVol):
    return BandVol(jax.nn.relu(bv.interior), jax.nn.relu(bv.lo),
                   jax.nn.relu(bv.hi), bv.d)


def band_add(a: BandVol, b: BandVol):
    """Add two banded volumes (pads the narrower band with interior)."""
    ea, eb = a.lo.shape[1], b.lo.shape[1]
    e = max(ea, eb)

    def widen(bv, to):
        cur = bv.lo.shape[1]
        if cur == to:
            return bv
        extra = to - cur
        rep = jnp.broadcast_to(
            bv.interior[:, None],
            bv.interior.shape[:1] + (extra,) + bv.interior.shape[1:])
        return BandVol(bv.interior,
                       jnp.concatenate([bv.lo, rep], axis=1),
                       jnp.concatenate([rep, bv.hi], axis=1), bv.d)

    a = widen(a, e)
    b = widen(b, e)
    return BandVol(a.interior + b.interior, a.lo + b.lo, a.hi + b.hi,
                   a.d)


def dual_conv3(cur2d, prev_vol, kernel):
    """3^3 conv of [cur_broadcast || prev] along channels, without
    materializing the broadcast: kernel (3, 3, 3, 2C, C') splits into a
    cur part (D-constant -> banded conv) and a prev part (dense conv3d).

    Returns a dense (B, D, H, W, C') volume.
    """
    c = cur2d.shape[-1]
    k_cur = kernel[..., :c, :]
    k_prev = kernel[..., c:, :]
    band = band_conv3(band_from_const(cur2d, prev_vol.shape[1]), k_cur)
    return band_to_dense(band) + _conv3d(
        prev_vol, k_prev.astype(prev_vol.dtype))
