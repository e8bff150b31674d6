"""LiDAR-feature imitation (distillation) losses.

Equivalent of the reference's imitation machinery
(mmdet3d/models/detectors/dfm.py:213-262 `_init_imitation_layers`,
:468-540 `get_imitation_reg_layer_loss`; detectors/imitation_utils.py
`NormalizeLayer` cw_scale + `WeightedL2WithSigmaLoss`):

* learnable 1x1 conv adapters on the student features;
* channel-wise scale normalization of the teacher features;
* in-box masks from BEV point-in-rotated-box tests (replacing the
  `points_in_boxes_part` CUDA op) applied at anchor/voxel centers;
* weighted-L2 with a clamped, cross-replica-averaged normalizer.

All static-shape; masks are computed against padded GT.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.boxes import points_in_rotated_boxes_bev

__all__ = ['ImitationAdapter', 'cw_scale_normalize', 'imitation_loss']


class ImitationAdapter(nn.Module):
    """1x1 conv adapter on student features (2D or 3D by input rank)."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = (1, 1) if x.ndim == 4 else (1, 1, 1)
        return nn.Conv(self.channels, k, use_bias=True,
                       dtype=self.dtype)(x)


def cw_scale_normalize(feat, eps=1e-6):
    """Channel-wise scale normalization of teacher features
    (reference NormalizeLayer('cw_scale'): divide each channel by its
    per-sample mean absolute value)."""
    axes = tuple(range(1, feat.ndim - 1))
    scale = jnp.mean(jnp.abs(feat), axis=axes, keepdims=True)
    return feat / jnp.maximum(scale, eps)


def imitation_loss(student_feat,
                   teacher_feat,
                   centers_xy,
                   gt_boxes,
                   gt_mask,
                   normalizer_clamp_value=10.0,
                   axis_name=None):
    """In-box masked weighted-L2 feature distillation.

    Args:
        student_feat: (B, ..., C) adapter output (BEV (B,Ny,Nx,C) or
            volume (B,Nz,Ny,Nx,C)).
        teacher_feat: same shape (will be cw_scale normalized; gradients
            are stopped — the teacher is frozen).
        centers_xy: (Ny*Nx, 2) BEV cell centers (z ignored as in the
            reference: dfm.py:486-487 zeroes z before the in-box test).
        gt_boxes: (B, G, 7); gt_mask: (B, G).

    Returns:
        scalar loss.
    """
    teacher_feat = jax.lax.stop_gradient(teacher_feat)
    b = student_feat.shape[0]
    spatial = student_feat.shape[1:-1]
    c = student_feat.shape[-1]

    def in_box_mask(gt_b, gm_b):
        m = points_in_rotated_boxes_bev(centers_xy, gt_b)   # (P, G)
        return jnp.any(m & gm_b[None, :], axis=-1)          # (P,)

    pos_bev = jax.vmap(in_box_mask)(gt_boxes, gt_mask)      # (B, Ny*Nx)
    if len(spatial) == 3:  # volume: broadcast over z
        nz = spatial[0]
        pos = jnp.tile(pos_bev[:, None], (1, nz, 1)).reshape(
            (b,) + spatial)
    else:
        pos = pos_bev.reshape((b,) + spatial)

    teacher_n = cw_scale_normalize(teacher_feat)
    # only where the teacher has support (reference: any(features != 0))
    support = jnp.any(teacher_feat != 0, axis=-1)
    weights = (pos & support).astype(jnp.float32)

    normalizer = weights.sum() / b
    if axis_name is not None:
        normalizer = jax.lax.pmean(normalizer, axis_name)
    weights = weights / jnp.maximum(normalizer, normalizer_clamp_value)

    diff = (student_feat.astype(jnp.float32) -
            teacher_n.astype(jnp.float32))
    loss = 0.5 * (diff * diff).mean(axis=-1) * weights
    return loss.sum() / b
