"""Deformable convolution v2 (gather + bilinear, XLA-native).

TPU equivalent of the mmcv CUDA `DCNv2` op used by the R101 backbone
of MV-FCOS3D++ / PGD-Waymo (reference
configs/dfm/multiview-dfm_r101_dcn_2x16_waymoD5-3d-3class_camsync.py:16,
`dcn=dict(type='DCNv2', deform_groups=1, fallback_on_stride=False)`).

DCNv2 (Zhu et al., 2019): a regular conv predicts per-tap offsets
(2 * K) and modulation masks (K, sigmoid); each of the K kernel taps
samples the input bilinearly at its displaced location and is scaled by
its mask before the weight contraction:

    y(p) = sum_k w_k . x(p + p_k + dp_k(p)) * m_k(p)

Implemented as K tap-packed bilinear gathers + K (HW, C_in) @
(C_in, C_out) matmuls — gathers are the TPU-native substitute for the
CUDA kernel's scattered reads; the contraction runs on the MXU.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from .packed_sample import pack_taps_2d, packed_bilinear_sample

__all__ = ['deform_conv2d']


def deform_conv2d(x, offset, mask, weight, stride=1, dilation=1):
    """Modulated deformable conv (DCNv2) forward.

    Args:
        x: (B, H, W, C_in).
        offset: (B, H_out, W_out, 2*K) per-tap (dy, dx) displacements
            (torchvision/mmcv channel order: [dy_0, dx_0, dy_1, ...]).
        mask: (B, H_out, W_out, K) modulation (already sigmoided) or
            None (DCNv1).
        weight: (kh, kw, C_in, C_out).
        stride, dilation: conv params (padding = dilation * (k // 2),
            'same'-style).

    Returns:
        (B, H_out, W_out, C_out).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    h_out, w_out = offset.shape[1:3]

    ys = jnp.arange(h_out, dtype=jnp.float32) * stride
    xs = jnp.arange(w_out, dtype=jnp.float32) * stride
    gy, gx = jnp.meshgrid(ys, xs, indexing='ij')    # (H_out, W_out)

    def single(x_i, off_i, mask_i):
        packed = pack_taps_2d(x_i)
        acc = jnp.zeros((h_out, w_out, cout), jnp.float32)
        for ki in range(k):
            dy = ki // kw
            dx = ki % kw
            base_y = gy + (dy - (kh - 1) / 2) * dilation
            base_x = gx + (dx - (kw - 1) / 2) * dilation
            py = base_y + off_i[..., 2 * ki]
            px = base_x + off_i[..., 2 * ki + 1]
            s = packed_bilinear_sample(
                packed, jnp.stack([px, py], axis=-1), cin)  # (H', W', Cin)
            if mask_i is not None:
                s = s * mask_i[..., ki:ki + 1]
            acc = acc + jnp.einsum(
                'hwc,co->hwo', s, weight[dy, dx],
                preferred_element_type=jnp.float32)
        return acc

    if mask is None:
        return jax.vmap(lambda a, o: single(a, o, None))(x, offset)
    return jax.vmap(single)(x, offset, mask)
