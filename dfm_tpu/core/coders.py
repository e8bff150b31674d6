"""Box regression coders (pure JAX).

`delta_xyzwlhr_*` match the reference's DeltaXYZWLHRBBoxCoder
(mmdet3d/core/bbox/coders/delta_xyzwhlr_bbox_coder.py:20-93) used by the
DfM / MV-FCOS3D++ anchor heads.
"""

import jax.numpy as jnp

__all__ = ['delta_xyzwlhr_encode', 'delta_xyzwlhr_decode']


def delta_xyzwlhr_encode(anchors, gt_boxes):
    """Encode gt boxes w.r.t. anchors: (..., 7+) -> (..., 7+) deltas."""
    xa, ya, za, wa, la, ha, ra = [anchors[..., i] for i in range(7)]
    xg, yg, zg, wg, lg, hg, rg = [gt_boxes[..., i] for i in range(7)]
    za = za + ha / 2
    zg = zg + hg / 2
    diagonal = jnp.sqrt(la**2 + wa**2)
    xt = (xg - xa) / diagonal
    yt = (yg - ya) / diagonal
    zt = (zg - za) / ha
    lt = jnp.log(lg / la)
    wt = jnp.log(wg / wa)
    ht = jnp.log(hg / ha)
    rt = rg - ra
    out = jnp.stack([xt, yt, zt, wt, lt, ht, rt], axis=-1)
    if anchors.shape[-1] > 7:
        out = jnp.concatenate(
            [out, gt_boxes[..., 7:] - anchors[..., 7:]], axis=-1)
    return out


def delta_xyzwlhr_decode(anchors, deltas):
    """Decode deltas on anchors back to boxes."""
    xa, ya, za, wa, la, ha, ra = [anchors[..., i] for i in range(7)]
    xt, yt, zt, wt, lt, ht, rt = [deltas[..., i] for i in range(7)]
    za = za + ha / 2
    diagonal = jnp.sqrt(la**2 + wa**2)
    xg = xt * diagonal + xa
    yg = yt * diagonal + ya
    zg = zt * ha + za
    lg = jnp.exp(lt) * la
    wg = jnp.exp(wt) * wa
    hg = jnp.exp(ht) * ha
    rg = rt + ra
    zg = zg - hg / 2
    out = jnp.stack([xg, yg, zg, wg, lg, hg, rg], axis=-1)
    if anchors.shape[-1] > 7:
        out = jnp.concatenate(
            [out, deltas[..., 7:] + anchors[..., 7:]], axis=-1)
    return out
