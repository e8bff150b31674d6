"""FrustumToVoxel neck (flax).

Equivalent of the reference's `FrustumToVoxel`
(mmdet3d/models/necks/feature_transformation.py:13-173): lifts the
plane-sweep stereo volume + 2D semantic features into a pseudo-LiDAR
voxel grid, applies Conv3d layers and height-pools z by 4.

TPU-first: the softmax-attention sampling never materializes the x4
upsampled volume (see dfm_tpu.ops.frustum); all samples are batched
gathers; fully vectorized over batch (the reference asserts bs==1).
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import numpy as np

from ...ops.frustum import (build_base27_tables,
                            project_voxels_to_frustum,
                            sample_sem_features_packed,
                            sample_softmax_base27_hat,
                            sample_stereo_volume_packed)
from ...ops import frustum_separable as FS
from ...ops.packed_sample import pack_taps_2d, pack_taps_3d
from ..layers import ConvNorm


class FrustumToVoxel(nn.Module):
    num_3dconvs: int = 1
    out_channels: int = 32
    sem_atten_feat: bool = True
    stereo_atten_feat: bool = False
    cat_img_feature: bool = True
    depth_min: float = 2.0
    depth_max: float = 59.6
    up_factor: int = 4
    pool_z: int = 4
    norm: str = 'gn'
    dtype: Any = jnp.float32
    # per-x-slab matmul sampling (requires KITTI P-form cam2img and a
    # STATIC np coors_3d; ~10x faster than the gather path on TPU —
    # see ops/frustum_separable.py). Automatically falls back to the
    # generic gather path when coors_3d is traced.
    separable: bool = True

    @nn.compact
    def __call__(self,
                 stereo_vol,          # (B, D, H', W', Cv)
                 depth_cost,          # (B, D, H', W') aggregated 1-ch cost
                 sem_feat,            # (B, Hs, Ws, Cs) or None
                 coors_3d,            # (Nz, Ny, Nx, 3) pseudo-lidar centers
                 cam2img,             # (B, 4, 4) augmented intrinsics
                 pad_shape: Tuple[int, int],
                 train: bool = False):
        """Returns volume features (B, Nz/pool_z, Ny, Nx, C_out)."""
        use_atten = self.stereo_atten_feat or (self.sem_atten_feat and
                                               self.cat_img_feature)
        separable = self.separable and isinstance(coors_3d, np.ndarray)

        # Pallas group-matmul sampler (2.2x over the einsums). MUST be
        # wrapped in a lax.cond: a top-level Mosaic custom call forces
        # XLA into a conservative whole-program schedule (-30 ms!),
        # inside a conditional it is isolated and the kernel's win
        # materializes (8.49 -> 8.64 fps; NOTES.md round-2 log).
        # DFM_NO_FRUSTUM_KERNEL=1 opts out.
        kernel_voxel = None
        fused_voxel = None
        import os
        if separable and stereo_vol.dtype == jnp.bfloat16 and \
                jax.default_backend() == 'tpu' and \
                not os.environ.get('DFM_NO_FRUSTUM_KERNEL'):
            # Pallas group-matmul sampler (2.2x over the einsums);
            # batched OUTSIDE the vmap (ops/pallas/frustum_sample.py)
            from ...ops.pallas.frustum_sample import (
                attention_sample_pallas, frustum_stereo_sample_pallas)
            xs = np.ascontiguousarray(coors_3d[0, 0, :, 0])
            ys = np.ascontiguousarray(coors_3d[0, :, 0, 1])
            zs = np.ascontiguousarray(coors_3d[:, 0, 0, 2])
            ds = FS.slab_depth_static(xs, self.depth_min,
                                      self.depth_max,
                                      stereo_vol.shape[1])
            groups = FS._group_slabs(ds['z0'])
            uv = jax.vmap(lambda c: FS.slab_uv(c, xs, ys, zs))(cam2img)
            g4 = (groups[0], groups[1], groups[2],
                  FS._runs(ds['z0']))
            # pred is effectively always true (finite grids); the cond
            # exists purely to isolate the custom call's schedule
            pred = jnp.isfinite(jnp.sum(uv[1]))
            sm_b = dsf = None
            if use_atten:
                sm_b = jax.vmap(lambda c: FS.build_fine_softmax_volume(
                    jax.lax.stop_gradient(c), self.up_factor,
                    pad_shape, dtype=jnp.bfloat16))(depth_cost)
                dsf = FS.slab_depth_static(
                    xs, self.depth_min, self.depth_max,
                    depth_cost.shape[1] * self.up_factor)
            fuse_cond = not os.environ.get('DFM_FRUSTUM_NO_FUSE')
            if fuse_cond:
                # ONE cond containing both kernels AND the glue (atten
                # multiply, sem sample, concat): the cond boundary then
                # carries a single bf16 volume instead of an unfused
                # voxel + a full-grid f32 attention + valid mask
                # (round-4 profile: ~4 ms of boundary materializations)
                cs = sem_feat.shape[-1] if (self.cat_img_feature and
                                            sem_feat is not None) else 0
                cout = stereo_vol.shape[-1] + cs

                def _fused(args):
                    vol_b, u_b, v_b, sm_bb, sem_b = args
                    voxel, valid2d = frustum_stereo_sample_pallas(
                        vol_b, u_b, v_b, ds, pad_shape, g4)
                    att = None
                    if use_atten:
                        att = attention_sample_pallas(
                            sm_bb, u_b, v_b, dsf, pad_shape)[0]
                        att = att.astype(voxel.dtype)[..., None]
                    if self.stereo_atten_feat:
                        voxel = voxel * att
                    if cs:
                        voxel2d = jax.vmap(
                            lambda s, u, v, m: FS.separable_sem_sample(
                                s, u, v, pad_shape, m))(
                            sem_b, u_b, v_b, valid2d)
                        if self.sem_atten_feat:
                            voxel2d = voxel2d * att
                        voxel = jnp.concatenate([voxel, voxel2d],
                                                axis=-1)
                    return voxel

                def _fzeros(args):
                    return jnp.zeros(
                        (stereo_vol.shape[0],) + coors_3d.shape[:3] +
                        (cout,), jnp.bfloat16)

                sem_arg = sem_feat if cs else \
                    jnp.zeros((stereo_vol.shape[0], 1, 1, 0),
                              stereo_vol.dtype)
                sm_arg = sm_b if use_atten else \
                    jnp.zeros((stereo_vol.shape[0], 1, 1, 1),
                              jnp.bfloat16)
                fused_voxel = jax.lax.cond(
                    pred, _fused, _fzeros,
                    (stereo_vol, uv[0], uv[1], sm_arg, sem_arg))
            else:
                kernel_voxel = jax.lax.cond(
                    pred,
                    lambda a: frustum_stereo_sample_pallas(
                        a[0], a[1], a[2], ds, pad_shape, g4),
                    lambda a: (jnp.zeros(
                        (a[0].shape[0],) + coors_3d.shape[:3] +
                        (a[0].shape[-1],), jnp.bfloat16),
                        jnp.zeros((a[0].shape[0],) +
                                  coors_3d.shape[:3], bool)),
                    (stereo_vol, uv[0], uv[1]))
                if use_atten:
                    kernel_att = jax.lax.cond(
                        pred,
                        lambda a: attention_sample_pallas(
                            a[0], a[1], a[2], dsf, pad_shape)[0],
                        lambda a: jnp.zeros(
                            (a[0].shape[0],) + coors_3d.shape[:3],
                            jnp.float32),
                        (sm_b, uv[0], uv[1]))
                    kernel_voxel = kernel_voxel + (kernel_att,)

        def single_separable(vol_i, cost_i, sem_i, c2i, pre=None):
            xs = np.ascontiguousarray(coors_3d[0, 0, :, 0])
            ys = np.ascontiguousarray(coors_3d[0, :, 0, 1])
            zs = np.ascontiguousarray(coors_3d[:, 0, 0, 2])
            u, v = FS.slab_uv(c2i, xs, ys, zs)
            ds = FS.slab_depth_static(xs, self.depth_min, self.depth_max,
                                      vol_i.shape[0])
            pre_att = None
            if pre is not None:
                voxel, valid2d = pre[0], pre[1]
                if len(pre) > 2:
                    pre_att = pre[2]
            else:
                voxel, valid2d = FS.separable_stereo_sample(
                    vol_i, u, v, ds, pad_shape)
            pred_disp = None
            if use_atten and pre_att is not None:
                pred_disp = pre_att[..., None].astype(voxel.dtype)
            elif use_atten:
                sm = FS.build_fine_softmax_volume(
                    jax.lax.stop_gradient(cost_i), self.up_factor,
                    pad_shape, dtype=jnp.bfloat16)
                dsf = FS.slab_depth_static(
                    xs, self.depth_min, self.depth_max,
                    cost_i.shape[0] * self.up_factor)
                pred_disp = FS.separable_softmax_attention(
                    sm, u, v, dsf, pad_shape)[..., None].astype(voxel.dtype)
            if self.stereo_atten_feat:
                voxel = voxel * pred_disp
            if self.cat_img_feature and sem_i is not None:
                voxel2d = FS.separable_sem_sample(
                    sem_i, u, v, pad_shape, valid2d)
                if self.sem_atten_feat:
                    voxel2d = voxel2d * pred_disp
                voxel = jnp.concatenate([voxel, voxel2d], axis=-1)
            return voxel

        def single(vol_i, cost_i, sem_i, c2i, pre=None):
            if separable:
                return single_separable(vol_i, cost_i, sem_i, c2i, pre)
            coord_img = project_voxels_to_frustum(coors_3d, c2i)
            c = vol_i.shape[-1]
            voxel, valid2d, _ = sample_stereo_volume_packed(
                pack_taps_3d(vol_i), c, coord_img, pad_shape,
                self.depth_min, self.depth_max)
            pred_disp = None
            if use_atten:
                # base27 hat-weight path: 2 small-table gathers/query,
                # never materializes the x4-upsampled softmax volume
                # (92 -> 35 ms at DfM shapes; see ops/frustum.py)
                b27, lse4 = build_base27_tables(
                    jax.lax.stop_gradient(cost_i), self.up_factor,
                    pad_shape, dtype=jnp.bfloat16, pad_lanes=64)
                pred_disp = sample_softmax_base27_hat(
                    b27, lse4, coord_img, pad_shape,
                    self.depth_min, self.depth_max, self.up_factor)
                pred_disp = pred_disp[..., None].astype(voxel.dtype)
            if self.stereo_atten_feat:
                voxel = voxel * pred_disp
            if self.cat_img_feature and sem_i is not None:
                cs = sem_i.shape[-1]
                voxel2d = sample_sem_features_packed(
                    pack_taps_2d(sem_i), cs, coord_img, pad_shape, valid2d)
                if self.sem_atten_feat:
                    voxel2d = voxel2d * pred_disp
                voxel = jnp.concatenate([voxel, voxel2d], axis=-1)
            return voxel

        sem_in = sem_feat if sem_feat is not None else \
            jnp.zeros((stereo_vol.shape[0], 1, 1, 0), stereo_vol.dtype)
        if fused_voxel is not None:
            vol = fused_voxel
        elif kernel_voxel is not None:
            vol = jax.vmap(single)(stereo_vol, depth_cost, sem_in,
                                   cam2img, kernel_voxel)
        else:
            vol = jax.vmap(single)(stereo_vol, depth_cost, sem_in,
                                   cam2img)    # (B, Nz, Ny, Nx, C)

        for i in range(self.num_3dconvs):
            cin = vol.shape[-1]
            fuse = (self.dtype == jnp.bfloat16 and self.norm == 'gn'
                    and cin >= 64 and 2 * cin <= 128
                    and vol.shape[3] % 2 == 0)
            if fuse:
                # grouped-layout fused conv+GN+relu (+ the z avg-pool
                # when this is the last conv): parameter tree matches
                # ConvNorm so checkpoints are interchangeable
                from ..backbones.dfm_backbone import _ParamsConvGN
                from ..layers import grouped_convgn3d
                k, sc, bs = _ParamsConvGN(cin, self.out_channels,
                                          name=f'voxel_conv{i}')()
                last = i == self.num_3dconvs - 1
                gn_groups = 32 if self.out_channels % 32 == 0 and \
                    self.out_channels >= 32 else self.out_channels
                vol = grouped_convgn3d(
                    vol, k, sc, bs, num_groups=gn_groups,
                    pool_z=self.pool_z if last else 1)
                if last:
                    return vol
            else:
                vol = ConvNorm(self.out_channels, (3, 3, 3),
                               norm=self.norm, dtype=self.dtype,
                               name=f'voxel_conv{i}')(vol, train)
        # AvgPool3d((pool_z, 1, 1)) over z
        b, nz, ny, nx, c = vol.shape
        vol = vol.reshape(b, nz // self.pool_z, self.pool_z, ny, nx, c)
        vol = vol.mean(axis=2)
        return vol
