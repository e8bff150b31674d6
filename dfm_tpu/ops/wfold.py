"""W-folded 2D convs: full MXU lane occupancy for narrow-channel convs.

The DfM image path ends in full-resolution (320x1280) convs with <= 32
channels (SPPUNetNeck stereo head, UpconvModule laterals — reference
mmdet3d/models/necks/spp_unet_neck.py:14-119, utils/conv_modules.py:
46-70). At C=32 a TPU conv occupies 1/4 of the 128 MXU lanes and XLA's
lowering reaches ~1-6 TF/s (measured: the 3x3 32->32 ConvNorm at
320x1280 costs 1.2 ms, the 1x1 0.7 ms, the 3->32 lateral 0.83 ms).

Folding g adjacent W positions into lanes fixes the occupancy exactly
(NOTES.md round-3 'wgroup': the (W, C) -> (W/g, gC) reshape is free):

    y(w) = sum_dx k[dx] x(w + dx),  w = g*wq + go

is a width-3 banded conv on the folded tensor:

    yf(wq, go) = sum_dq kf[dq] xf(wq + dq),
    kf[ky, dq, gi*Ci:(gi+1)*Ci, go*Co:(go+1)*Co] = k[ky, dx]
        iff dx = g*dq + gi - go is a valid tap,

with 'SAME' zero padding in folded space matching the original zero
padding bit-exactly (the only out-of-range folded reads map to
original w < 0 / w >= W). The banded kernel pays a g-fold FLOP
redundancy at full lane occupancy — a win whenever the dense ceiling
(~200 TF/s at 128 lanes) divided by g beats the narrow conv's
achieved rate (measured in-model: 3-6 TF/s for C<=32).

Unlike the parked 3D 'wgroup' path (NOTES.md: ungroup relayouts cost
~4 ms/layer in-model), the 2D fold/unfold are plain reshapes that XLA
composes and cancels across consecutive folded ops.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ['fold_kernel_w', 'wfold_conv2d', 's2d_conv2d_s2']


def fold_kernel_w(kernel, g):
    """(ky, kx, ci, co) -> (ky, kq, g*ci, g*co) W-banded, kx in {1, 3}.

    kq = 3 for kx == 3, 1 for kx == 1.
    """
    ky, kx, ci, co = kernel.shape
    assert kx in (1, 3), kx
    kq = 3 if kx == 3 else 1
    kf = jnp.zeros((ky, kq, g * ci, g * co), kernel.dtype)
    for go in range(g):
        for gi in range(g):
            for qi in range(kq):
                dq = qi - kq // 2
                dx = g * dq + gi - go
                if -(kx // 2) <= dx <= kx // 2:
                    kf = kf.at[:, qi, gi * ci:(gi + 1) * ci,
                               go * co:(go + 1) * co].set(
                                   kernel[:, dx + kx // 2])
    return kf


def _fold_kernel_s2(kernel):
    """(k, k, ci, co) odd-k stride-2 kernel -> space-to-depth folded
    ((k+1)//2 + k//2 - k//2//1..., see below) stride-1 kernel.

    With both spatial dims space-to-depth'ed by 2 (channel layout
    (ry*2 + rx)*ci + c), an input tap t = d - k//2 of output o reads
    original row 2o + t = 2(o + q) + r with q = floor(t/2),
    r = t mod 2 — i.e. folded tap q, channel group r. q spans
    [floor(-(k//2)/2), floor((k//2)/2)], an asymmetric window: folded
    kernel extent kq = k//2 + 1, padding (k//2 - k//4, k//4).
    """
    import numpy as np
    k = kernel.shape[0]
    ci, co = kernel.shape[2], kernel.shape[3]
    assert kernel.shape[1] == k and k % 2 == 1
    half = k // 2
    q_min = -((half + 1) // 2)
    q_max = half // 2
    kq = q_max - q_min + 1
    kf = jnp.zeros((kq, kq, 4 * ci, co), kernel.dtype)
    for dy in range(k):
        ty = dy - half
        qy, ry = ty // 2, ty % 2          # floor div/mod: 2*qy + ry == ty
        for dx in range(k):
            tx = dx - half
            qx, rx = tx // 2, tx % 2
            grp = (ry * 2 + rx) * ci
            kf = kf.at[qy - q_min, qx - q_min,
                       grp:grp + ci, :].set(kernel[dy, dx])
    return kf, (-q_min, q_max)


def s2d_conv2d_s2(x, kernel):
    """Odd-k stride-2 'SAME' 2D conv via space-to-depth; exact.

    x: (B, H, W, Ci) with H, W even; kernel: (k, k, Ci, Co), k odd.
    Equivalent to conv(stride=2, padding=k//2); returns
    (B, H/2, W/2, Co). The 2x2 pixel fold lifts the contraction from
    k*k*Ci to ~(k//2+1)^2*4*Ci at full lane occupancy (the DfM use:
    the LIGA stem's 7x7 s2 3->64 at 320x1280 runs at <3 TF/s dense —
    Ci = 3 — and ~an order of magnitude faster folded).
    """
    b, h, w, ci = x.shape
    assert h % 2 == 0 and w % 2 == 0
    kf, (pl_, pr) = _fold_kernel_s2(kernel)
    kf = kf.astype(x.dtype)
    xf = x.reshape(b, h // 2, 2, w // 2, 2, ci)
    xf = xf.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * ci)
    return jax.lax.conv_general_dilated(
        xf, kf, (1, 1), [(pl_, pr), (pl_, pr)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def wfold_conv2d(x, kernel, g):
    """'SAME' stride-1 2D conv via the W-folded banded kernel; exact.

    x: (B, H, W, Ci) with W % g == 0; kernel: (ky, kx, Ci, Co),
    kx in {1, 3}. Returns (B, H, W, Co).
    """
    b, h, w, ci = x.shape
    ky, kx, ci_k, co = kernel.shape
    assert ci_k == ci and w % g == 0, (kernel.shape, x.shape, g)
    kf = fold_kernel_w(kernel, g).astype(x.dtype)
    xf = x.reshape(b, h, w // g, g * ci)
    yf = jax.lax.conv_general_dilated(
        xf, kf, (1, 1), [(ky // 2, ky // 2), (kf.shape[1] // 2,
                                              kf.shape[1] // 2)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return yf.reshape(b, h, w, co)
