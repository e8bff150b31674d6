"""Shared flax building blocks (channels-last, 2D & 3D).

Equivalents of the reference's mmcv `ConvModule`, `convbn`/`convbn_3d`,
`upconv_module` and the 2D/3D hourglass blocks
(mmdet3d/models/utils/conv_modules.py, backbones/bev_hourglass.py) in
idiomatic flax:

* NHWC / NDHWC layouts (TPU conv-friendly);
* BatchNorm: under pjit data-parallel sharding, batch reductions are
  global, so plain `nn.BatchNorm` already has SyncBN semantics — no
  explicit collective needed;
* `dtype` controls compute precision (bf16 recommended on TPU),
  parameters stay f32.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_linear

Dtype = Any


class Conv3DSum(nn.Module):
    """kxkxk Conv3D with a dtype-dependent lowering.

    Measured on v5e at DfM cost-volume shapes (72x80x320, C32 3^3):
    f32 direct Conv3D lowers ~1.7x slower than a sum of k z-shifted 2D
    convs (14.7 vs 8.5 ms), but in bf16 the direct lowering wins
    (5.8 vs 8.2 ms, tools/convbench.py). Parameter layout matches
    nn.Conv ('kernel' (kz,ky,kx,I,O)) so checkpoints are
    interchangeable between both lowerings.
    """
    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        b, d, h, w, cin = x.shape
        kz, ky, kx = self.kernel_size
        sz, sy, sx = self.strides
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (kz, ky, kx, cin, self.features), jnp.float32)
        kernel = kernel.astype(self.dtype)
        # bf16 lowering matrix (v5e, tools/convbench.py + round-3 A/B,
        # measured IN-MODEL, not just standalone):
        #   * C32 stride-1 3^3: z-shifted 2D decomposition (zsum,
        #     below) — 4.4 ms. The W-group lane packing (wgroup4) wins
        #     standalone (3.9 ms) but the ungroup relayout it forces on
        #     the consumer (GN/residual want (..., 32) lanes) costs
        #     ~4 ms per layer in-model: dres1 5.0 -> 9.0. Parked.
        #   * cin >= 64 stride-1 with W even: W-group g=2 (banded-zero
        #     (2C -> 2C_out) kernel on the FREE (W/2, 2C) reshape) —
        #     the voxel conv drops ~1 ms in-model and ~40% standalone.
        #   * strided: XLA direct (decomposed forms force relayouts;
        #     hourglass 7.8 -> 12.7 ms under zsum).
        # f32 keeps the z-shifted decomposition below (CPU/tests).
        # (large planes only: at hourglass half-res XLA direct hits
        # ~98 TF/s and the W-group relayout would regress it)
        if self.dtype == jnp.bfloat16 and (kz, ky, kx) == (3, 3, 3) \
                and self.strides == (1, 1, 1) and cin >= 64 \
                and cin * 2 <= 128 and w % 2 == 0 and h * w >= 32768:
            out = _wgroup_conv3d(x, kernel, 2)
            if self.use_bias:
                bias = self.param('bias', nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                out = out + bias.astype(self.dtype)
            return out
        if self.dtype == jnp.bfloat16 and (self.strides != (1, 1, 1)
                                           or cin >= 64):
            out = jax.lax.conv_general_dilated(
                x, kernel, (sz, sy, sx),
                [(kz // 2, kz // 2), (ky // 2, ky // 2),
                 (kx // 2, kx // 2)],
                dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
                preferred_element_type=jnp.float32).astype(self.dtype)
            if self.use_bias:
                bias = self.param('bias', nn.initializers.zeros,
                                  (self.features,), jnp.float32)
                out = out + bias.astype(self.dtype)
            return out
        pz = kz // 2
        xp = jnp.pad(x, ((0, 0), (pz, pz), (0, 0), (0, 0), (0, 0)))
        d_out = (d + 2 * pz - kz) // sz + 1
        out = None
        for dz in range(kz):
            sl = xp[:, dz:dz + (d_out - 1) * sz + 1:sz]  # (B,Dout,H,W,C)
            flat = sl.reshape(b * d_out, h, w, cin)
            o = jax.lax.conv_general_dilated(
                flat, kernel[dz], (sy, sx),
                [(ky // 2, ky // 2), (kx // 2, kx // 2)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)
            out = o if out is None else out + o
        out = out.astype(self.dtype)
        h_out = (h + 2 * (ky // 2) - ky) // sy + 1
        w_out = (w + 2 * (kx // 2) - kx) // sx + 1
        out = out.reshape(b, d_out, h_out, w_out, self.features)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


def _wgroup_conv3d(x, kernel, g):
    """Exact 3^3 stride-1 conv via W-group lane packing (see the
    lowering notes in Conv3DSum): output group slot j at group site q
    reads input slots r of group sites q-1+t through the original tap
    dx = (t-1)*g + r - j + 1 when 0 <= dx < 3."""
    b, d, h, w, cin = x.shape
    cout = kernel.shape[-1]
    blocks = []
    for t in range(3):
        rows = []
        for r in range(g):
            cols = []
            for j in range(g):
                dx = (t - 1) * g + r - j + 1
                cols.append(kernel[:, :, dx] if 0 <= dx < 3 else
                            jnp.zeros((3, 3, cin, cout), kernel.dtype))
            rows.append(jnp.concatenate(cols, axis=-1))
        blocks.append(jnp.concatenate(rows, axis=-2))
    kk = jnp.stack(blocks, axis=2)           # (3, 3, 3, g*cin, g*cout)
    xg = x.reshape(b, d, h, w // g, g * cin)
    o = jax.lax.conv_general_dilated(
        xg, kk, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=jnp.float32)
    return o.reshape(b, d, h, w, cout).astype(x.dtype)


def grouped_convgn3d(x, kernel, scale, bias, pool_z=1, eps=1e-5,
                     num_groups=None):
    """Fused 3^3 stride-1 conv + per-channel GroupNorm + ReLU
    (+ z avg-pool) that STAYS in the W-group lane-packed layout until
    the very end: the conv runs as `_wgroup_conv3d`'s banded (2C->2C')
    kernel, GN statistics fold the two group slots (per-channel sums
    are invariant to the lane grouping), scale/bias/ReLU/pool apply on
    the grouped tensor, and the (W/2, 2C') -> (W, C') un-grouping
    relayout is paid only on the pool_z-times-smaller result.

    Numerically identical to ConvNorm(norm='gn', groups=C') + z-pool
    (verified bit-exact in bf16); measured 13.4 -> ~9 ms on the
    frustum voxel conv (B=1, 20x304x288, 64->32, v5e)."""
    g = 2
    b, d, h, w, cin = x.shape
    cout = kernel.shape[-1]
    kernel = kernel.astype(x.dtype)
    blocks = []
    for t in range(3):
        rows = []
        for r in range(g):
            cols = []
            for j in range(g):
                dx = (t - 1) * g + r - j + 1
                cols.append(kernel[:, :, dx] if 0 <= dx < 3 else
                            jnp.zeros((3, 3, cin, cout), kernel.dtype))
            rows.append(jnp.concatenate(cols, axis=-1))
        blocks.append(jnp.concatenate(rows, axis=-2))
    kk = jnp.stack(blocks, axis=2)           # (3, 3, 3, g*cin, g*cout)
    xg = x.reshape(b, d, h, w // g, g * cin)
    o = jax.lax.conv_general_dilated(
        xg, kk, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=jnp.float32)
    ob = o.astype(x.dtype)
    of = ob.astype(jnp.float32)
    gn = num_groups or cout
    cpg = cout // gn
    s = of.sum(axis=(1, 2, 3)).reshape(b, g, gn, cpg).sum(axis=(1, 3))
    s2 = (of * of).sum(axis=(1, 2, 3)).reshape(b, g, gn,
                                               cpg).sum(axis=(1, 3))
    cnt = d * h * w * cpg
    mean = jnp.repeat(s / cnt, cpg, axis=1)
    var = jnp.repeat(s2 / cnt, cpg, axis=1) - mean * mean
    sc = scale.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    bs = bias.astype(jnp.float32) - mean * sc
    sc2 = jnp.tile(sc, (1, g))[:, None, None, None]
    bs2 = jnp.tile(bs, (1, g))[:, None, None, None]
    y = jnp.maximum(of * sc2 + bs2, 0.0).astype(x.dtype)
    if pool_z > 1:
        y = y.reshape(b, d // pool_z, pool_z, h, w // g,
                      g * cout).mean(axis=2)
        d = d // pool_z
    return y.reshape(b, d, h, w, cout)


class Conv2D(nn.Module):
    """2D conv with a lowering-aware backend; param tree == nn.Conv.

    For narrow-channel stride-1 convs (max(Ci, Co) <= 32, k 1x1/3x3,
    bf16, W % 4 == 0, TPU) XLA's conv occupies <= 1/4 of the MXU lanes
    and reaches 1-6 TF/s at DfM full-image shapes; the W-folded banded
    lowering (ops/wfold.py) runs the same conv at full occupancy
    (measured v5e @320x1280: 3x3 32->32 0.94 -> 0.22 ms, 3->32
    0.63 -> 0.08, 1x1 32->32 0.68 -> 0.12). Everything else takes the
    plain nn.Conv-equivalent path. DFM_WFOLD=0 opts out.
    """
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os
        ci = x.shape[-1]
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (*self.kernel_size, ci, self.features), jnp.float32)
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        lead = x.shape[:-3]            # nn.Conv-style extra batch dims
        x = x.reshape((-1,) + x.shape[-3:])
        fold = (self.kernel_size in ((1, 1), (3, 3))
                and self.dtype == jnp.bfloat16
                and x.shape[-2] % 4 == 0
                and max(ci, self.features) <= 32
                and os.environ.get('DFM_WFOLD', '1') != '0'
                and jax.default_backend() == 'tpu')
        if fold:
            from ..ops.wfold import wfold_conv2d
            y = wfold_conv2d(x, k, 128 // max(32, ci, self.features))
        else:
            ky, kx = self.kernel_size
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), [(ky // 2, ky // 2), (kx // 2, kx // 2)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            y = y + self.param('bias', nn.initializers.zeros,
                               (self.features,), jnp.float32
                               ).astype(self.dtype)
        return y.reshape(lead + y.shape[-3:])


class Conv2DStride2(nn.Module):
    """Odd-k stride-2 2D conv, space-to-depth lowered when it wins;
    param tree == nn.Conv. Tiny-Ci stride-2 stems (LIGA 7x7 3->64)
    leave the MXU contraction at k*k*Ci ~ 147 and run at <3 TF/s; the
    2x2 pixel fold (ops/wfold.py s2d_conv2d_s2) is exact and lifts the
    contraction 4x. DFM_WFOLD=0 opts out."""
    features: int
    kernel_size: Tuple[int, int] = (7, 7)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os
        ci = x.shape[-1]
        k = self.kernel_size[0]
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (*self.kernel_size, ci, self.features), jnp.float32)
        x = x.astype(self.dtype)
        kk = kernel.astype(self.dtype)
        fold = (k % 2 == 1 and self.kernel_size[1] == k
                and self.dtype == jnp.bfloat16 and ci <= 8
                and x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0
                and os.environ.get('DFM_WFOLD', '1') != '0'
                and jax.default_backend() == 'tpu')
        if fold:
            from ..ops.wfold import s2d_conv2d_s2
            return s2d_conv2d_s2(x, kk)
        return jax.lax.conv_general_dilated(
            x, kk, (2, 2), [(k // 2, k // 2)] * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class ConvNorm(nn.Module):
    """Conv (2D or 3D by kernel rank) + norm + optional ReLU."""
    features: int
    kernel_size: Tuple[int, ...] = (3, 3)
    strides: Optional[Tuple[int, ...]] = None
    dilation: Optional[Tuple[int, ...]] = None
    norm: str = 'gn'           # 'bn' | 'gn' | 'none'
    groups: int = 32
    act: bool = True
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    bn_momentum: float = 0.9   # flax convention: ra = m*ra + (1-m)*batch

    @nn.compact
    def __call__(self, x, train: bool = False):
        if len(self.kernel_size) == 3 and (self.dilation is None):
            x = Conv3DSum(self.features, self.kernel_size,
                          self.strides or (1, 1, 1),
                          use_bias=self.use_bias, dtype=self.dtype,
                          name='Conv_0')(x)
        elif (len(self.kernel_size) == 2
              and self.strides in (None, (1, 1))
              and self.dilation is None):
            x = Conv2D(self.features, tuple(self.kernel_size),
                       use_bias=self.use_bias, dtype=self.dtype,
                       name='Conv_0')(x)
        else:
            x = nn.Conv(
                self.features, self.kernel_size,
                strides=self.strides,
                kernel_dilation=self.dilation,
                padding=[((k // 2) * d, (k // 2) * d) for k, d in zip(
                    self.kernel_size,
                    self.dilation or (1,) * len(self.kernel_size))],
                use_bias=self.use_bias, dtype=self.dtype)(x)
        x = apply_norm(self, x, self.norm, self.groups, train,
                       self.bn_momentum, self.dtype)
        if self.act:
            x = nn.relu(x)
        return x


class GroupNorm(nn.Module):
    """Drop-in nn.GroupNorm with a folded single-pass apply.

    Same math (f32 statistics, var = E[x^2] - E[x]^2 like flax) but the
    normalization is folded into ONE per-(batch, channel) scale/bias
    multiply-add executed at the compute dtype — on bf16 volumes this
    removes the f32 re-centering round-trip XLA emits for nn.GroupNorm
    (measured 1.74 -> 0.8 ms overhead on a 72x80x320x32 ConvNorm, v5e).
    Parameter tree ('scale', 'bias') and auto-name ('GroupNorm_<i>')
    are identical to nn.GroupNorm, so checkpoints are interchangeable.
    """
    num_groups: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        b = x.shape[0]
        g = self.num_groups
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32).reshape(b, -1, g, c // g)
        mean = xf.mean(axis=(1, 3))                       # (B, g)
        var = (xf * xf).mean(axis=(1, 3)) - mean * mean
        return fold_gn_apply(x, mean, var, scale, bias, self.epsilon)


def fold_gn_apply(x, mean, var, scale, bias, eps=1e-5):
    """Apply GroupNorm given per-(batch, group) moments as ONE fused
    scale/bias multiply-add (f32 compute, cast on store).

    x: (B, ..., C); mean/var: (B, g); scale/bias: (C,).
    """
    b = x.shape[0]
    c = x.shape[-1]
    g = mean.shape[-1]
    rstd = jax.lax.rsqrt(var + eps)                      # (B, g)
    sc = scale.reshape(g, c // g) * rstd[..., None]      # (B, g, C/g)
    bs = bias.reshape(g, c // g) - mean[..., None] * sc
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    return (x.astype(jnp.float32) * sc.reshape(b, c).reshape(shape) +
            bs.reshape(b, c).reshape(shape)).astype(x.dtype)


def apply_norm(mdl, x, norm, groups, train, bn_momentum=0.9,
               dtype=jnp.float32):
    if norm == 'bn':
        return nn.BatchNorm(
            use_running_average=not train, momentum=bn_momentum,
            epsilon=1e-5, dtype=dtype)(x)
    if norm == 'gn':
        # GN over min(groups, C) to stay valid for small channel counts
        g = groups if x.shape[-1] % groups == 0 and x.shape[-1] >= groups \
            else x.shape[-1]
        return GroupNorm(num_groups=g, dtype=dtype)(x)
    if norm == 'none':
        return x
    raise ValueError(norm)


class ConvTransposeNorm(nn.Module):
    """ConvTranspose (2x upsample, torch k3/s2/p1/op1 equivalent) + norm."""
    features: int
    ndim: int = 2
    norm: str = 'gn'
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (3,) * self.ndim
        s = (2,) * self.ndim
        # torch ConvTranspose k3 s2 p1 op1: out = 2*in; XLA equivalent
        # is lhs-dilated conv with padding (1, 2) per spatial dim
        x = nn.ConvTranspose(
            self.features, k, strides=s,
            padding=[(1, 2)] * self.ndim,
            use_bias=False, dtype=self.dtype)(x)
        x = apply_norm(self, x, self.norm, self.groups, train,
                       dtype=self.dtype)
        return x


class Hourglass(nn.Module):
    """2-level hourglass with pre/post skip connections; `ndim` selects the
    2D (BEV) or 3D (cost volume) variant. Mirrors the reference's
    `hourglass` / `hourglass2d` topology: two stride-2 encoders, two
    transposed-conv decoders, skip adds at 1/2 and 1/1 scales."""
    features: int              # inplanes; internal width is 2x
    ndim: int = 3
    norm: str = 'gn'
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, presqu=None, postsqu=None, train: bool = False):
        k = (3,) * self.ndim
        s2 = (2,) * self.ndim
        c2 = self.features * 2
        out = ConvNorm(c2, k, strides=s2, norm=self.norm, groups=self.groups,
                       act=True, dtype=self.dtype)(x, train)          # 1/2
        pre = ConvNorm(c2, k, norm=self.norm, groups=self.groups,
                       act=False, dtype=self.dtype)(out, train)       # 1/2
        if postsqu is not None:
            pre = nn.relu(pre + postsqu)
        else:
            pre = nn.relu(pre)

        out = ConvNorm(c2, k, strides=s2, norm=self.norm, groups=self.groups,
                       act=True, dtype=self.dtype)(pre, train)        # 1/4
        out = ConvNorm(c2, k, norm=self.norm, groups=self.groups,
                       act=True, dtype=self.dtype)(out, train)        # 1/4

        post = ConvTransposeNorm(c2, self.ndim, self.norm, self.groups,
                                 self.dtype)(out, train)              # 1/2
        if presqu is not None:
            post = nn.relu(post + presqu)
        else:
            post = nn.relu(post + pre)

        out = ConvTransposeNorm(self.features, self.ndim, self.norm,
                                self.groups, self.dtype)(post, train)  # 1/1
        return out, pre, post


class UpconvModule(nn.Module):
    """LIGA upconv decoder (reference conv_modules.py:46-70): repeated
    [conv -> 2x bilinear up -> add lateral -> relu]."""
    up_channels: Sequence[int]
    norm: str = 'bn'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[0]
        for stage, ch in enumerate(self.up_channels):
            x = ConvNorm(ch, (3, 3), norm=self.norm, act=False,
                         dtype=self.dtype)(x, train)
            lateral = ConvNorm(ch, (3, 3), norm=self.norm, act=False,
                               dtype=self.dtype)(feats[stage + 1], train)
            up = resize_linear(
                x, (lateral.shape[1], lateral.shape[2]), axes=(1, 2),
                align_corners=False)
            x = nn.relu(up + lateral)
        return x
