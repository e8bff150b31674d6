"""DfM temporal-stereo backbone (flax).

Equivalent of the reference's `DfMBackbone`
(mmdet3d/models/backbones/dfm_backbone.py:15-214): plane-sweep cost
volume -> 3D conv stems (dres0/dres1 residual) -> 3D hourglass stack for
the stereo branch, a parallel mono branch on the cur-frame half, per-
branch depth-prediction Conv3d modules, and a learned sigmoid gate
fusing the stereo/mono depth costs.

Volumes are channels-last (B, D, H', W', C); the cost volume comes from
`dfm_tpu.ops.cost_volume.build_plane_sweep_cost`. Unlike the reference
(batch-size-1 assert at dfm_backbone.py:160-172), everything is batched.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.band_volume import (band_add, band_conv3, band_from_const,
                                band_gn, band_relu, band_to_dense,
                                dual_conv3)
from ...ops.cost_volume import build_plane_sweep_cost
from ...ops.reduced_depth import make_reduced_plan
from ..layers import Conv3DSum, ConvNorm, Hourglass, fold_gn_apply


class _ConvKernel(nn.Module):
    """Parameter holder matching Conv3DSum's tree ({'kernel'})."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param('kernel', nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _GNParams(nn.Module):
    """Parameter holder matching nn.GroupNorm's tree ({'scale','bias'})."""
    features: int

    @nn.compact
    def __call__(self):
        return (self.param('scale', nn.initializers.ones,
                           (self.features,), jnp.float32),
                self.param('bias', nn.initializers.zeros,
                           (self.features,), jnp.float32))


def _gn_groups(c, groups):
    # mirror layers.apply_norm group selection
    return groups if c % groups == 0 and c >= groups else c


class _ParamsConvGN(nn.Module):
    """Parameter holder with ConvNorm's exact tree ('Conv_0/kernel',
    'GroupNorm_0/{scale,bias}'); returns the raw params."""
    cin: int
    features: int

    @nn.compact
    def __call__(self):
        k = _ConvKernel((3, 3, 3, self.cin, self.features),
                        name='Conv_0')()
        s, b = _GNParams(self.features, name='GroupNorm_0')()
        return k, s, b


def _conv2d_f(x, k):
    return jax.lax.conv_general_dilated(
        x[None], k.astype(x.dtype), (1, 1), [(1, 1)] * 2,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)[0]


def packed_stereo_stem(cur2d, prev_pv, k0, gn0, k1, gn1, groups,
                       keep_packed=False, interpret=False):
    """dres0 + dres1 of the stereo branch on the z-packed layout
    (ops/pallas/conv_chain.py): dual conv -> GN -> relu -> conv -> GN ->
    +residual, all without leaving the packed form; one unpack at the
    end (or none with keep_packed — the hourglass chain consumes the
    packed form directly). Exactly DualConvNorm + ConvNorm(act=False) +
    residual on the same params. Single-sample inputs.

    Reference semantics: mmdet3d/models/backbones/dfm_backbone.py
    dres0/dres1 (convbn_3d stacks, :175-186).
    """
    from ...ops.pallas.conv_chain import (conv_p2p, dres0_stats_affine,
                                          gn_affine_res_packed,
                                          unpack_affine_res)
    c = cur2d.shape[-1]
    k_cur = k0[..., :c, :]
    k_prev = k0[..., c:, :]
    ci = _conv2d_f(cur2d, k_cur.sum(axis=0))
    clo = ci - _conv2d_f(cur2d, k_cur[0])
    chi = ci - _conv2d_f(cur2d, k_cur[2])
    u0, ps0 = conv_p2p(prev_pv, k_prev, interpret=interpret)   # phase 2
    y0 = dres0_stats_affine(u0, ps0, ci, clo, chi, gn0[0], gn0[1], groups)
    u1, ps1 = conv_p2p(y0, k1, interpret=interpret)            # phase 0
    if keep_packed:
        return gn_affine_res_packed(u1, ps1, gn1[0], gn1[1], groups,
                                    res_pv=y0, interpret=interpret)
    return unpack_affine_res(u1, ps1, gn1[0], gn1[1], groups, res_pv=y0,
                             interpret=interpret)


class _ParamsConvTGN(nn.Module):
    """Parameter holder with ConvTransposeNorm's exact tree
    ('ConvTranspose_0/kernel', 'GroupNorm_0/{scale,bias}')."""
    cin: int
    features: int

    @nn.compact
    def __call__(self):
        k = _ConvKernel((3, 3, 3, self.cin, self.features),
                        name='ConvTranspose_0')()
        s, b = _GNParams(self.features, name='GroupNorm_0')()
        return k, s, b


class HourglassParams(nn.Module):
    """Parameter holders with `Hourglass`'s exact tree (ConvNorm_0..3,
    ConvTransposeNorm_0/1) so checkpoints are interchangeable between
    the dense and packed hourglass paths. Declared OUTSIDE the Pallas
    lax.cond wrapper (flax params cannot be created inside a cond
    branch)."""
    features: int

    @nn.compact
    def __call__(self):
        c, c2 = self.features, self.features * 2
        return dict(
            cn0=_ParamsConvGN(c, c2, name='ConvNorm_0')(),
            cn1=_ParamsConvGN(c2, c2, name='ConvNorm_1')(),
            cn2=_ParamsConvGN(c2, c2, name='ConvNorm_2')(),
            cn3=_ParamsConvGN(c2, c2, name='ConvNorm_3')(),
            ct0=_ParamsConvTGN(c2, c2, name='ConvTransposeNorm_0')(),
            ct1=_ParamsConvTGN(c2, c, name='ConvTransposeNorm_1')())


def _conv3d_f(x, k, strides=(1, 1, 1)):
    return jax.lax.conv_general_dilated(
        x[None], k.astype(x.dtype), strides, [(1, 1)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=jnp.float32)[0].astype(x.dtype)


def _convt3d_f(x, k):
    # torch k3/s2/p1/op1 (layers.py ConvTransposeNorm padding (1, 2))
    return jax.lax.conv_transpose(
        x[None], k.astype(x.dtype), (2, 2, 2), [(1, 2)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=jnp.float32)[0].astype(x.dtype)


def _gn_f(x, scale, bias, g, eps=1e-5):
    d, h, w, c = x.shape
    xx = x.reshape(-1, g, c // g).astype(jnp.float32)
    mean = xx.mean(axis=(0, 2))
    var = (xx * xx).mean(axis=(0, 2)) - mean * mean
    return fold_gn_apply(x[None], mean[None], var[None], scale, bias,
                         eps)[0]


def packed_hourglass(x_pv, hp, groups=32, mults=None, interpret=False):
    """3D Hourglass + caller residual on the z-packed layout
    (reference dfm_backbone.py hourglass loop `cost0 = cost0 +
    hg(cost0)`; dense equivalent models/layers.py Hourglass:261-300,
    presqu/postsqu=None).

    Full-resolution ends run as Pallas packed kernels — the stride-2
    entry conv reads the packed volume (ops/pallas/conv_chain.py
    conv_s2_p2d) and the final transpose conv is decomposed into 27
    half-res matmul taps (convt1_parity) whose parity sub-volumes are
    interleaved straight back into the packed layout with fused GN
    moments (pack_parity8). The half/quarter-resolution interior runs
    dense C=64 XLA convs (already near the matmul roofline there).
    `hp` = HourglassParams(). Single-sample, inference-only.

    `mults` = (m0, m1, m2) per-scale z-slice multiplicity vectors for
    a REDUCED-depth volume (ops/reduced_depth.py): every GroupNorm
    weights its statistics so they equal the full-volume stats — this
    is the RedHourglass semantics on the packed chain (the mono
    branch).
    """
    from ...ops.pallas.conv_chain import (conv_s2_p2d, convt1_parity,
                                          gn_dense_from_partials,
                                          gn_from_partials, pack_parity8)
    m0 = m1 = m2 = None
    if mults is not None:
        m0, m1, m2 = [np.asarray(m, np.float32) for m in mults]
    k0, s0, b0 = hp['cn0']
    c2 = k0.shape[-1]
    c = k0.shape[-2]
    g2 = _gn_groups(c2, groups)
    d2, h2, w2 = x_pv.d // 2, x_pv.h // 2, x_pv.w // 2
    u0, ps0 = conv_s2_p2d(x_pv, k0, interpret=interpret)
    cnt1 = (float(m1.sum()) if m1 is not None else d2) * h2 * w2
    out = gn_dense_from_partials(u0, ps0, cnt1, s0, b0, g2,
                                 relu=True, cout=c2, zw=m1, d=d2)
    k1, s1, b1 = hp['cn1']

    def gn2(x, sc, bi, mult):
        if mult is None:
            return _gn_f(x, sc, bi, g2)
        return _weighted_gn(x[None], mult, sc, bi, g2, x.dtype)[0]

    pre = jax.nn.relu(gn2(_conv3d_f(out, k1), s1, b1, m1))
    k2, s2_, b2 = hp['cn2']
    mid = jax.nn.relu(gn2(_conv3d_f(pre, k2, (2, 2, 2)), s2_, b2, m2))
    k3, s3, b3 = hp['cn3']
    mid = jax.nn.relu(gn2(_conv3d_f(mid, k3), s3, b3, m2))
    kt0, st0, bt0 = hp['ct0']
    post = gn2(_convt3d_f(mid, kt0), st0, bt0, m1)
    post = jax.nn.relu(post + pre)
    kt1, st1, bt1 = hp['ct1']
    par = convt1_parity(post, kt1.astype(post.dtype))
    u1, ps1 = pack_parity8(par, th=x_pv.th, interpret=interpret)
    # GN affine of the transpose conv + the hourglass residual
    # (x + res) in one fused pass, staying packed
    return gn_from_partials(ps1, u1, st1, bt1, _gn_groups(c, groups),
                            extra=x_pv.data, zw=m0)


class PredStereoPacked(nn.Module):
    """DepthPredModule split for the packed chain: the ConvNorm runs
    as conv_p2p INSIDE the per-sample Pallas cond (params exposed via
    `convnorm_params`), the 1-channel scalar conv runs batched outside
    (`scalar`). Tree matches DepthPredModule ('ConvNorm_0' +
    'Conv_0')."""
    cv: int = 32
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.ConvNorm_0 = _ParamsConvGN(self.cv, self.cv)
        self.Conv_0 = Conv3DScalar(dtype=self.dtype)

    def convnorm_params(self):
        return self.ConvNorm_0()

    def scalar(self, x):
        return self.Conv_0(x)

    def __call__(self, x):   # init-trace convenience
        self.convnorm_params()
        return self.scalar(x)


class PackedPred(nn.Module):
    """DepthPredModule on the packed layout: pack -> conv+GN+relu ->
    unpack -> scalar conv. Tree matches DepthPredModule
    ('ConvNorm_0' + 'Conv_0'). Single-sample input (D, H, W, C)."""
    cv: int = 32
    dtype: Any = jnp.bfloat16
    interpret: bool = False

    @nn.compact
    def __call__(self, feats):
        from ...ops.pallas.conv_chain import (conv_p2p, pack_vol,
                                              unpack_affine_res)
        k, s, b = _ParamsConvGN(self.cv, self.cv, name='ConvNorm_0')()
        pv = pack_vol(feats.astype(self.dtype), phase=2,
                      interpret=self.interpret)
        u, ps = conv_p2p(pv, k, interpret=self.interpret)    # phase 0
        x = unpack_affine_res(u, ps, s, b, _gn_groups(self.cv, 32),
                              relu=True, interpret=self.interpret)
        return Conv3DScalar(dtype=self.dtype, name='Conv_0')(x[None])[0]


class BandConvNorm(nn.Module):
    """ConvNorm(3^3, GN) on a depth-banded volume (exact D-constant
    shortcut; see ops/band_volume.py). Parameter tree is identical to
    `ConvNorm` with a 3D kernel + GroupNorm ('Conv_0/kernel',
    'GroupNorm_0/{scale,bias}'), so checkpoints are interchangeable
    with the dense path."""
    features: int
    groups: int = 32
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bv):
        cin = bv.interior.shape[-1]
        kernel = _ConvKernel((3, 3, 3, cin, self.features),
                             name='Conv_0')()
        bv = bv._replace(interior=bv.interior.astype(self.dtype),
                         lo=bv.lo.astype(self.dtype),
                         hi=bv.hi.astype(self.dtype))
        bv = band_conv3(bv, kernel)
        scale, bias = _GNParams(self.features, name='GroupNorm_0')()
        bv = band_gn(bv, scale.astype(self.dtype), bias.astype(self.dtype),
                     _gn_groups(self.features, self.groups))
        return band_relu(bv) if self.act else bv


class DualConvNorm(nn.Module):
    """ConvNorm(3^3, GN) on [cur_broadcast || prev] without materializing
    the D-constant cur half (ops/band_volume.py:dual_conv3). Same
    parameter tree as `ConvNorm`; returns a dense volume."""
    features: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cur2d, prev_vol, train: bool = False):
        cin = cur2d.shape[-1] + prev_vol.shape[-1]
        kernel = _ConvKernel((3, 3, 3, cin, self.features),
                             name='Conv_0')()
        x = dual_conv3(cur2d.astype(self.dtype),
                       prev_vol.astype(self.dtype),
                       kernel.astype(self.dtype))
        scale, bias = _GNParams(self.features, name='GroupNorm_0')()
        g = _gn_groups(self.features, self.groups)
        b = x.shape[0]
        xx = x.reshape(b, -1, g, self.features // g).astype(jnp.float32)
        mean = xx.mean(axis=(1, 3))
        var = (xx * xx).mean(axis=(1, 3)) - mean * mean
        x = fold_gn_apply(x, mean, var, scale, bias)
        return nn.relu(x)


class Conv3DScalar(nn.Module):
    """3x3x3 Conv3D with ONE output channel.

    XLA's conv lowering wastes 127/128 MXU columns on C_out=1 (measured
    ~8 ms for a 3.2 GFLOP conv at DfM shapes). Reformulated exactly:
    per-tap channel contraction as one (N, C) @ (C, 27) matmul, then 27
    shifted single-channel adds (VPU). Parameter layout matches nn.Conv
    ('kernel' (3, 3, 3, C, 1)) so checkpoints are interchangeable.
    """
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, 3, c, 1), jnp.float32)
        kt = kernel[..., 0].reshape(27, c).astype(self.dtype)   # (27, C)
        # tap-major layout: T[t] is a contiguous (B, D, H, W) slab, so
        # the shifted adds below slice leading/sublane axes instead of
        # extracting single lanes (which forces a relayout per tap)
        t = jnp.einsum('tc,bdhwc->tbdhw', kt, x.astype(self.dtype),
                       preferred_element_type=jnp.float32
                       ).astype(self.dtype)   # store taps at compute
        # width: halves the HBM traffic of the 27-slab reduce below
        # out[p] = sum_t w_t . x[p + t - 1]  =  sum_t T[t, p + t - 1]
        tp = jnp.pad(t, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
        tp = jax.lax.optimization_barrier(tp)
        out = jnp.zeros((b, d, h, w), jnp.float32)
        for i, (dz, dy, dx) in enumerate(
                (dz, dy, dx) for dz in range(3) for dy in range(3)
                for dx in range(3)):
            out = out + tp[i, :, dz:dz + d, dy:dy + h,
                           dx:dx + w].astype(jnp.float32)
        return out[..., None].astype(self.dtype)


def _assemble_reduced(bv, plan):
    """BandVol -> reduced dense volume [lo | interior x k | hi]."""
    b, h, w, c = bv.interior.shape
    e = bv.lo.shape[1]
    mid = jnp.broadcast_to(bv.interior[:, None],
                           (b, plan.dr - 2 * e, h, w, c))
    return jnp.concatenate([bv.lo, mid, bv.hi], axis=1)


def _weighted_gn(x, mult, scale, bias, num_groups, dtype, eps=1e-5):
    """GroupNorm whose statistics weight each depth slice by its
    full-volume multiplicity (ops/reduced_depth.py): bit-equal to GN on
    the expanded volume in f32 accumulation."""
    b, d, h, w, c = x.shape
    g = num_groups
    xx = x.reshape(b, d, h * w, g, c // g).astype(jnp.float32)
    m = jnp.asarray(mult, jnp.float32)[None, :, None, None, None]
    cnt = float(np.sum(mult)) * h * w * (c // g)
    s = (xx * m).sum(axis=(1, 2, 4))
    s2 = (xx * xx * m).sum(axis=(1, 2, 4))
    mean = s / cnt
    var = s2 / cnt - mean ** 2
    return fold_gn_apply(x, mean, var, scale, bias, eps).astype(dtype)


class RedConvNorm(nn.Module):
    """ConvNorm(3D, GN) on a reduced-depth volume: plain conv + the
    multiplicity-weighted GN. Same parameter tree as ConvNorm."""
    features: int
    strides: tuple = (1, 1, 1)
    groups: int = 32
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mult, train: bool = False):
        x = Conv3DSum(self.features, (3, 3, 3), self.strides,
                      dtype=self.dtype, name='Conv_0')(x)
        scale, bias = _GNParams(self.features, name='GroupNorm_0')()
        x = _weighted_gn(x, mult, scale, bias,
                         _gn_groups(self.features, self.groups),
                         self.dtype)
        return nn.relu(x) if self.act else x


class RedConvTransposeNorm(nn.Module):
    """ConvTransposeNorm (2x up, torch k3/s2/p1/op1) with weighted GN.
    Same parameter tree as ConvTransposeNorm."""
    features: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mult, train: bool = False):
        x = nn.ConvTranspose(self.features, (3, 3, 3), strides=(2, 2, 2),
                             padding=[(1, 2)] * 3, use_bias=False,
                             dtype=self.dtype,
                             name='ConvTranspose_0')(x)
        scale, bias = _GNParams(self.features, name='GroupNorm_0')()
        return _weighted_gn(x, mult, scale, bias,
                            _gn_groups(self.features, self.groups),
                            self.dtype)


class RedHourglass(nn.Module):
    """3D Hourglass on a reduced-depth volume (presqu/postsqu=None
    case). Same parameter tree as `Hourglass` (models/layers.py)."""
    features: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, plan, train: bool = False):
        c2 = self.features * 2
        m0, m1, m2 = plan.mult(0), plan.mult(1), plan.mult(2)
        out = RedConvNorm(c2, strides=(2, 2, 2), groups=self.groups,
                          dtype=self.dtype, name='ConvNorm_0')(
                              x, m1, train)
        pre = RedConvNorm(c2, groups=self.groups, act=False,
                          dtype=self.dtype, name='ConvNorm_1')(
                              out, m1, train)
        pre = nn.relu(pre)
        out = RedConvNorm(c2, strides=(2, 2, 2), groups=self.groups,
                          dtype=self.dtype, name='ConvNorm_2')(
                              pre, m2, train)
        out = RedConvNorm(c2, groups=self.groups, dtype=self.dtype,
                          name='ConvNorm_3')(out, m2, train)
        post = RedConvTransposeNorm(c2, self.groups, self.dtype,
                                    name='ConvTransposeNorm_0')(
                                        out, m1, train)
        post = nn.relu(post + pre)
        out = RedConvTransposeNorm(self.features, self.groups, self.dtype,
                                   name='ConvTransposeNorm_1')(
                                       post, m0, train)
        return out


class RedDepthPredModule(nn.Module):
    """DepthPredModule on a reduced-depth volume. Same parameter tree
    as DepthPredModule (ConvNorm_0 + Conv_0)."""
    cv_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, plan, train: bool = False):
        x = RedConvNorm(self.cv_channels, dtype=self.dtype,
                        name='ConvNorm_0')(x, plan.mult(0), train)
        return Conv3DScalar(dtype=self.dtype, name='Conv_0')(x)


class DepthPredModule(nn.Module):
    """ConvNorm(3d) + Conv3d->1 channel (reference
    `build_depth_pred_module`, dfm_backbone.py:118-128)."""
    cv_channels: int
    norm: str = 'gn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvNorm(self.cv_channels, (3, 3, 3), norm=self.norm,
                     dtype=self.dtype)(x, train)
        x = Conv3DScalar(dtype=self.dtype, name='Conv_0')(x)
        return x  # (B, D, H, W, 1)


class DfMBackbone(nn.Module):
    in_channels: int = 32
    cv_channels: int = 32
    num_hg: int = 1
    cost_sample_factor: int = 4
    feat_sample_factor: int = 1
    num_depth_bins_out: int = 72   # num_bins // depth downsample factor
    norm: str = 'gn'
    dtype: Any = jnp.float32
    # exact D-constant shortcut for the cur half of the volume (the dres
    # stages run banded, ~6x fewer conv FLOPs on the mono stem); same
    # parameter tree as the dense path — False forces dense (tests)
    use_band: bool = True

    @nn.compact
    def __call__(self,
                 cur_stereo_feats,
                 prev_stereo_feats,
                 depths,
                 cam2img,
                 cur2prev,
                 org_w=None,
                 flip=None,
                 crop_offset=None,
                 scale_factor=None,
                 train: bool = False):
        """Args mirror `build_plane_sweep_cost`; returns
        (mono_stereo_cost (B,D,H',W',1), stereo_feats (B,D,H',W',Cv),
        mono_feats (B,D,H',W',Cv))."""
        csf = self.cost_sample_factor
        banded = (self.use_band and self.norm == 'gn'
                  and float(csf) == float(int(csf)))
        # z-packed Pallas conv chain for the full-res stereo stem + pred
        # (ops/pallas/conv_chain.py). Inference-only (no custom VJP yet);
        # DFM_PACKED=0 disables, DFM_PACKED=interpret forces the
        # interpreter (CPU equivalence tests).
        import os
        packed_env = os.environ.get('DFM_PACKED', '1')
        packed_interp = packed_env == 'interpret'
        packed = (banded and not train and packed_env != '0'
                  and self.dtype == jnp.bfloat16
                  and (packed_interp or jax.default_backend() == 'tpu'))
        packed_hg = False
        stereo_pred_feat = None
        mono_pred_feat = None

        def hg_stack(cur, tag):
            for i in range(self.num_hg):
                res, _, _ = Hourglass(self.cv_channels, ndim=3,
                                      norm=self.norm, dtype=self.dtype,
                                      name=f'hg_{tag}_{i}')(cur, train=train)
                cur = cur + res
            return cur

        if banded:
            cur2d, prev_vol = build_plane_sweep_cost(
                cur_stereo_feats, prev_stereo_feats, depths, cam2img,
                cur2prev, cost_sample_factor=csf,
                feat_sample_factor=self.feat_sample_factor,
                org_w=org_w, flip=flip, crop_offset=crop_offset,
                scale_factor=scale_factor, split=True)
            cur2d = cur2d.astype(self.dtype)
            prev_vol = prev_vol.astype(self.dtype)
            d = prev_vol.shape[1]
            b_, _, hq, wq, _ = prev_vol.shape
            packed = (packed and d % 4 == 0 and hq % 8 == 0
                      and wq % 16 == 0)
            # the full packed chain (stem + hourglass + pred ConvNorm
            # without any full-res relayout between layers) needs the
            # half-res row tiles to divide too
            packed_hg = (packed and hq % 16 == 0
                         and os.environ.get('DFM_PACKED_HG', '1') != '0')
            if packed_hg:
                from ...ops.pallas.conv_chain import (pack_vol,
                                                      unpack_affine_res,
                                                      unpack_vol)
                c_in = cur2d.shape[-1]
                k0, s0s, s0b = _ParamsConvGN(
                    2 * c_in, self.cv_channels, name='dres0_stereo')()
                k1, s1s, s1b = _ParamsConvGN(
                    self.cv_channels, self.cv_channels,
                    name='dres1_stereo')()
                g = _gn_groups(self.cv_channels, 32)
                hps = [HourglassParams(self.cv_channels,
                                       name=f'hg_stereo_{i}')()
                       for i in range(self.num_hg)]
                pred_s = PredStereoPacked(self.cv_channels, self.dtype,
                                          name='pred_stereo')
                kp, sps, spb = pred_s.convnorm_params()

                def _chain(args):
                    cur_i, prev_i = args
                    pv = pack_vol(prev_i, phase=0,
                                  interpret=packed_interp)
                    x_pv = packed_stereo_stem(
                        cur_i, pv, k0, (s0s, s0b), k1, (s1s, s1b), g,
                        keep_packed=True, interpret=packed_interp)
                    for hp in hps:
                        x_pv = packed_hourglass(x_pv, hp,
                                                interpret=packed_interp)
                    from ...ops.pallas.conv_chain import conv_p2p
                    up, psp = conv_p2p(x_pv, kp, interpret=packed_interp)
                    pred_feat = unpack_affine_res(
                        up, psp, sps, spb, g, relu=True,
                        interpret=packed_interp)
                    return unpack_vol(x_pv, interpret=packed_interp), \
                        pred_feat

                def _zeros(args):
                    z = jnp.zeros(prev_vol.shape[1:], self.dtype)
                    return z, z

                # lax.cond wrapper (always true for finite inputs):
                # a TOP-LEVEL Mosaic call forces XLA into a conservative
                # whole-program schedule (NOTES.md round-2); the cond
                # isolates the kernel chain's schedule.
                outs = [jax.lax.cond(
                    jnp.isfinite(prev_vol[i, 0, 0, 0, 0]),
                    _chain, _zeros, (cur2d[i], prev_vol[i]))
                    for i in range(b_)]
                stereo_feats = jnp.stack([o[0] for o in outs])
                stereo_pred_feat = jnp.stack([o[1] for o in outs])
            elif packed:
                from ...ops.pallas.conv_chain import pack_vol
                c_in = cur2d.shape[-1]
                k0, s0s, s0b = _ParamsConvGN(
                    2 * c_in, self.cv_channels, name='dres0_stereo')()
                k1, s1s, s1b = _ParamsConvGN(
                    self.cv_channels, self.cv_channels,
                    name='dres1_stereo')()
                g = _gn_groups(self.cv_channels, 32)

                def _stem(args):
                    cur_i, prev_i = args
                    pv = pack_vol(prev_i, phase=0,
                                  interpret=packed_interp)
                    return packed_stereo_stem(
                        cur_i, pv, k0, (s0s, s0b), k1, (s1s, s1b), g,
                        interpret=packed_interp)

                def _zeros(args):
                    return jnp.zeros(prev_vol.shape[1:], self.dtype)

                # lax.cond wrapper (always true for finite inputs):
                # a TOP-LEVEL Mosaic call forces XLA into a conservative
                # whole-program schedule (NOTES.md round-2); the cond
                # isolates the kernel chain's schedule.
                s0 = jnp.stack([
                    jax.lax.cond(jnp.isfinite(prev_vol[i, 0, 0, 0, 0]),
                                 _stem, _zeros, (cur2d[i], prev_vol[i]))
                    for i in range(b_)])
            else:
                # stereo stem: conv of [cur_bcast || prev], no bcast
                s0 = DualConvNorm(self.cv_channels, dtype=self.dtype,
                                  name='dres0_stereo')(cur2d, prev_vol)
                s0 = ConvNorm(self.cv_channels, (3, 3, 3), norm=self.norm,
                              act=False, dtype=self.dtype,
                              name='dres1_stereo')(s0, train) + s0
            if not packed_hg:
                stereo_feats = hg_stack(s0, 'stereo')
            # mono stem: fully banded (input is D-constant)
            m0 = BandConvNorm(self.cv_channels, dtype=self.dtype,
                              name='dres0_mono')(band_from_const(cur2d, d))
            m1 = BandConvNorm(self.cv_channels, act=False, dtype=self.dtype,
                              name='dres1_mono')(m0)
            mono_band = band_add(m1, m0)
            # hourglass + pred on a reduced-depth volume (exact: see
            # ops/reduced_depth.py); falls back to dense for short D
            mono_plan = make_reduced_plan(d, e=mono_band.lo.shape[1]) \
                if self.num_hg == 1 else None
            # packed-chain mono: the reduced volume through the same
            # Pallas kernels as the stereo trunk, with multiplicity-
            # WEIGHTED GroupNorm finishers (exact RedHourglass
            # semantics; the kernels' per-(block, lane-group) partial
            # moments expose per-z-slice sums)
            packed_mono = (packed and mono_plan is not None
                           and mono_plan.dr % 4 == 0
                           and os.environ.get('DFM_PACKED_MONO', '1')
                           != '0')
            if packed_mono:
                from ...ops.pallas.conv_chain import (conv_p2p, pack_vol,
                                                      unpack_affine_res,
                                                      unpack_vol)
                red = _assemble_reduced(mono_band, mono_plan)
                red = red.astype(self.dtype)
                hpm = HourglassParams(self.cv_channels,
                                      name='hg_mono_0')()
                pred_m = PredStereoPacked(self.cv_channels, self.dtype,
                                          name='pred_mono')
                kpm, spms, spmb = pred_m.convnorm_params()
                gm = _gn_groups(self.cv_channels, 32)
                mults = (mono_plan.mult(0), mono_plan.mult(1),
                         mono_plan.mult(2))

                def _mono_chain(red_i):
                    pv = pack_vol(red_i, phase=0,
                                  interpret=packed_interp)
                    x_pv = packed_hourglass(pv, hpm, mults=mults,
                                            interpret=packed_interp)
                    upm, psm = conv_p2p(x_pv, kpm,
                                        interpret=packed_interp)
                    pf = unpack_affine_res(
                        upm, psm, spms, spmb, gm, relu=True,
                        zw=mults[0], interpret=packed_interp)
                    return unpack_vol(x_pv, interpret=packed_interp), pf

                def _mono_zeros(red_i):
                    z = jnp.zeros(red.shape[1:], self.dtype)
                    return z, z

                outs_m = [jax.lax.cond(
                    jnp.isfinite(red[i, 0, 0, 0, 0]),
                    _mono_chain, _mono_zeros, red[i])
                    for i in range(red.shape[0])]
                mono_red = jnp.stack([o[0] for o in outs_m])
                mono_pred_feat = jnp.stack([o[1] for o in outs_m])
                mono_feats = mono_red[:, mono_plan.expand_idx]
            elif mono_plan is not None:
                red = _assemble_reduced(mono_band, mono_plan)
                res = RedHourglass(self.cv_channels, dtype=self.dtype,
                                   name='hg_mono_0')(red, mono_plan,
                                                     train=train)
                mono_red = red + res
                mono_feats = mono_red[:, mono_plan.expand_idx]
            else:
                mono_red = None
                mono_feats = hg_stack(band_to_dense(mono_band), 'mono')
        else:
            cost_raw = build_plane_sweep_cost(
                cur_stereo_feats, prev_stereo_feats, depths, cam2img,
                cur2prev, cost_sample_factor=csf,
                feat_sample_factor=self.feat_sample_factor,
                org_w=org_w, flip=flip, crop_offset=crop_offset,
                scale_factor=scale_factor).astype(self.dtype)

            def branch(x, tag):
                c0 = ConvNorm(self.cv_channels, (3, 3, 3), norm=self.norm,
                              dtype=self.dtype, name=f'dres0_{tag}')(x, train)
                c0 = ConvNorm(self.cv_channels, (3, 3, 3), norm=self.norm,
                              act=False, dtype=self.dtype,
                              name=f'dres1_{tag}')(c0, train) + c0
                return hg_stack(c0, tag)

            stereo_feats = branch(cost_raw, 'stereo')
            mono_feats = branch(cost_raw[..., :self.in_channels], 'mono')
            mono_red = mono_plan = None

        # depth cost prediction + sigmoid gate fusion
        if packed_hg:
            # the pred ConvNorm already ran inside the packed chain;
            # only the 1-channel scalar conv remains
            stereo_cost = pred_s.scalar(stereo_pred_feat)
        elif packed and os.environ.get('DFM_PACKED_PRED'):
            pred_sp = PackedPred(self.cv_channels, self.dtype,
                                 packed_interp, name='pred_stereo')
            stereo_cost = jnp.stack(
                [pred_sp(stereo_feats[i])
                 for i in range(stereo_feats.shape[0])])
        else:
            stereo_cost = DepthPredModule(
                self.cv_channels, self.norm, self.dtype,
                name='pred_stereo')(stereo_feats, train)
        if mono_pred_feat is not None:
            # the pred ConvNorm already ran inside the packed chain
            mono_cost = pred_m.scalar(mono_pred_feat)
            mono_cost = mono_cost[:, mono_plan.expand_idx]
        elif mono_red is not None:
            mono_cost = RedDepthPredModule(
                self.cv_channels, dtype=self.dtype,
                name='pred_mono')(mono_red, mono_plan, train)
            mono_cost = mono_cost[:, mono_plan.expand_idx]
        else:
            mono_cost = DepthPredModule(
                self.cv_channels, self.norm, self.dtype,
                name='pred_mono')(mono_feats, train)
        # gate: Conv2d over stacked (2D,) depth channels
        # (B, D, H, W, 1) -> (B, H, W, D)
        s2d = stereo_cost[..., 0].transpose(0, 2, 3, 1)
        m2d = mono_cost[..., 0].transpose(0, 2, 3, 1)
        gate_in = jnp.concatenate([s2d, m2d], axis=-1)
        weight = nn.Conv(self.num_depth_bins_out, (1, 1), use_bias=False,
                         dtype=self.dtype, name='aggregate_cost')(gate_in)
        weight = nn.sigmoid(weight).transpose(0, 3, 1, 2)[..., None]
        mono_stereo_cost = weight * stereo_cost + (1 - weight) * mono_cost
        return mono_stereo_cost, stereo_feats, mono_feats
