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

from ...ops.cost_volume import build_plane_sweep_cost
from ..layers import ConvNorm, Hourglass


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
                       preferred_element_type=jnp.float32)
        # out[p] = sum_t w_t . x[p + t - 1]  =  sum_t T[t, p + t - 1]
        tp = jnp.pad(t, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
        tp = jax.lax.optimization_barrier(tp)
        out = 0.
        for i, (dz, dy, dx) in enumerate(
                (dz, dy, dx) for dz in range(3) for dy in range(3)
                for dx in range(3)):
            out = out + tp[i, :, dz:dz + d, dy:dy + h, dx:dx + w]
        return out[..., None].astype(self.dtype)


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
        cost_raw = build_plane_sweep_cost(
            cur_stereo_feats, prev_stereo_feats, depths, cam2img, cur2prev,
            cost_sample_factor=self.cost_sample_factor,
            feat_sample_factor=self.feat_sample_factor,
            org_w=org_w, flip=flip, crop_offset=crop_offset,
            scale_factor=scale_factor).astype(self.dtype)

        def branch(x, tag):
            c0 = ConvNorm(self.cv_channels, (3, 3, 3), norm=self.norm,
                          dtype=self.dtype, name=f'dres0_{tag}')(x, train)
            c0 = ConvNorm(self.cv_channels, (3, 3, 3), norm=self.norm,
                          act=False, dtype=self.dtype,
                          name=f'dres1_{tag}')(c0, train) + c0
            cur = c0
            for i in range(self.num_hg):
                res, _, _ = Hourglass(self.cv_channels, ndim=3,
                                      norm=self.norm, dtype=self.dtype,
                                      name=f'hg_{tag}_{i}')(cur, train=train)
                cur = cur + res
            return cur

        stereo_feats = branch(cost_raw, 'stereo')
        mono_feats = branch(cost_raw[..., :self.in_channels], 'mono')

        # depth cost prediction + sigmoid gate fusion
        stereo_cost = DepthPredModule(self.cv_channels, self.norm, self.dtype,
                                      name='pred_stereo')(stereo_feats, train)
        mono_cost = DepthPredModule(self.cv_channels, self.norm, self.dtype,
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
