"""LiDAR teacher for DfM feature imitation (train-time only).

Equivalent role to the reference's frozen `VoxelNet` teacher
(configs/dfm/dfm_r34_1x8_kitti-3d-3class.py lidar_model: Voxelization
0.05 m -> HardSimpleVFE -> CustomSparseEncoder (spconv) -> BEVHourglass;
used via `extract_lidar_model_feat`, detectors/dfm.py:373-382).

TPU-native redesign: fixed-capacity voxelization by scatter-mean onto a
dense grid (no dynamic voxel lists / CUDA scatter), a dense 3D conv
encoder at the imitation grid resolution (0.2 m — the resolution at
which features are actually compared; the reference's 0.05 m sparse
stages exist to *produce* that volume), then the shared BEVHourglass.
Outputs the same imitation interface: `volume_features`
(B, Nz, Ny, Nx, C) and `spatial_features_2d` (B, Ny, Nx, C2).

A native sparse submanifold encoder at 0.05 m is a planned upgrade;
the teacher is frozen at train time so the imitation interface is the
contract, not the internal resolution.
"""

import functools
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..backbones.bev_hourglass import BEVHourglass
from ..layers import ConvNorm


def voxelize_mean(points, point_mask, pcr, voxel_size, grid_size,
                  max_points=None):
    """Scatter-mean point features onto a dense voxel grid.

    Args:
        points: (P, 3+) pseudo-lidar points (padded to fixed P).
        point_mask: (P,) validity.
        pcr: point-cloud range (6,).
        voxel_size: (vx, vy, vz).
        grid_size: (Nz, Ny, Nx).
        max_points: per-voxel point cap. None averages ALL points in a
            voxel (the reference's *dynamic* voxelization +
            DynamicSimpleVFE, mmdet3d voxelize.py / DynamicVoxelNet);
            an int keeps only the first `max_points` points per voxel
            (hard Voxelization + HardSimpleVFE — SECOND uses 5).

    Returns:
        (Nz, Ny, Nx, C) mean features (0 where empty),
        (Nz, Ny, Nx) counts.

    Replaces mmcv `Voxelization` + `(Hard|Dynamic)SimpleVFE` with a
    segment-scatter — fixed shapes, fully on-device.
    """
    nz, ny, nx = grid_size
    ix = jnp.floor((points[:, 0] - pcr[0]) / voxel_size[0]).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - pcr[1]) / voxel_size[1]).astype(jnp.int32)
    iz = jnp.floor((points[:, 2] - pcr[2]) / voxel_size[2]).astype(jnp.int32)
    inside = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny) &
              (iz >= 0) & (iz < nz) & point_mask)
    flat = (iz * ny + iy) * nx + ix
    flat = jnp.where(inside, flat, nz * ny * nx)  # dump slot
    num = nz * ny * nx + 1
    if max_points is not None:
        # rank of each point within its voxel (arrival order): stable
        # sort by voxel id, then position minus segment start
        p = points.shape[0]
        order = jnp.argsort(flat, stable=True)
        sorted_flat = flat[order]
        pos = jnp.arange(p)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_flat[1:] != sorted_flat[:-1]])
        seg_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_start, pos, 0))
        rank_sorted = pos - seg_start
        rank = jnp.zeros((p,), jnp.int32).at[order].set(
            rank_sorted.astype(jnp.int32))
        keep = rank < max_points
        inside = inside & keep
        flat = jnp.where(inside, flat, nz * ny * nx)
    feats = jnp.where(inside[:, None], points, 0.0)
    sums = jax.ops.segment_sum(feats, flat, num_segments=num)
    cnts = jax.ops.segment_sum(inside.astype(jnp.float32), flat,
                               num_segments=num)
    mean = sums[:-1] / jnp.maximum(cnts[:-1, None], 1.0)
    c = points.shape[-1]
    return (mean.reshape(nz, ny, nx, c),
            cnts[:-1].reshape(nz, ny, nx))


class LidarTeacher(nn.Module):
    """Dense voxel encoder + BEV hourglass producing imitation targets."""
    point_cloud_range: Tuple[float, ...] = (2, -30.4, -3, 59.6, 30.4, 1)
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 0.2)
    pool_z: int = 4                      # to the DfM volume z resolution
    volume_channels: int = 32
    bev_channels: int = 64
    max_points: Any = None               # per-voxel cap (hard VFE); None
    dtype: Any = jnp.float32             # = dynamic (all points)

    def grid_size(self):
        pcr = np.asarray(self.point_cloud_range, np.float32)
        gs = np.round((pcr[3:] - pcr[:3]) /
                      np.asarray(self.voxel_size)).astype(int)
        return int(gs[2]), int(gs[1]), int(gs[0])

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        """Args:
            points: (B, P, 3) padded pseudo-lidar points.
            point_mask: (B, P).

        Returns:
            volume_features (B, Nz/pool_z, Ny, Nx, C),
            spatial_features_2d (B, Ny, Nx, C2).
        """
        gs = self.grid_size()
        vox, cnt = jax.vmap(
            lambda p, m: voxelize_mean(p, m, self.point_cloud_range,
                                       self.voxel_size, gs,
                                       max_points=self.max_points)
        )(points, point_mask)
        x = jnp.concatenate(
            [vox, (cnt > 0).astype(vox.dtype)[..., None]],
            axis=-1).astype(self.dtype)
        x = ConvNorm(16, (3, 3, 3), norm='bn', dtype=self.dtype,
                     name='enc0')(x, train)
        x = ConvNorm(self.volume_channels, (3, 3, 3), norm='bn',
                     dtype=self.dtype, name='enc1')(x, train)
        x = ConvNorm(self.volume_channels, (3, 3, 3), norm='bn',
                     dtype=self.dtype, name='enc2')(x, train)
        # z-pool to the imitation volume resolution
        b, nz, ny, nx, c = x.shape
        vol = x.reshape(b, nz // self.pool_z, self.pool_z, ny, nx, c)
        vol = vol.mean(axis=2)
        # height compression -> BEV
        bz = vol.shape[1]
        bev = vol.transpose(0, 2, 3, 1, 4).reshape(b, ny, nx, bz * c)
        _, bev_feat = BEVHourglass(out_channels=self.bev_channels,
                                   norm='bn', dtype=self.dtype,
                                   name='bev')(bev, train)
        return vol, bev_feat


class SparseBN(nn.Module):
    """BatchNorm1d over valid sparse voxels (masked statistics).

    Matches the reference teacher's `BN1d(eps=1e-3, momentum=0.01)`
    on spconv features: statistics are computed over the ACTIVE voxels
    of the whole batch; dead capacity slots are excluded and zeroed on
    output. Running stats follow the torch convention
    (running = (1-m)*running + m*batch, m=0.01)."""
    features: int
    eps: float = 1e-3
    momentum: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, vmask, train: bool = False):
        """x: (B, V, C); vmask: (B, V)."""
        scale = self.param('scale', nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((self.features,)))
        if train:
            m = vmask[..., None].astype(jnp.float32)
            cnt = jnp.maximum(m.sum(), 1.0)
            xf = x.astype(jnp.float32) * m
            mean = xf.sum(axis=(0, 1)) / cnt
            var = (x.astype(jnp.float32) - mean)**2 * m
            var = var.sum(axis=(0, 1)) / cnt
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + \
                    self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + \
                    self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return (y * vmask[..., None]).astype(self.dtype)


class _SpKernel(nn.Module):
    """Tap-major sparse conv kernel parameter ((K, C_in, C_out))."""
    taps: int
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        return self.param('kernel', nn.initializers.lecun_normal(),
                          (self.taps, self.cin, self.cout), jnp.float32)


class SparseEncoder05(nn.Module):
    """LIGA CustomSparseEncoder at 0.05 m, TPU-native.

    Mirrors the reference teacher encoder (configs/dfm/dfm_r34_1x8_
    kitti-3d-3class.py:22-31 + middle_encoders/sparse_encoder.py:218):
    SubM(3->16) input conv; stages (16,), (32,32,32), (64,64,64),
    (64,64,64) with strides (1), (2,1,1), (2,1,1), ((2,1,1),1,1) and
    stage-4 z-only downsample (padding (0,1,1)); 1x1 conv_out 64->32
    with no norm/act (with_final_bnrelu=False). Sparse shape
    (41, 1216, 1152) -> dense (5, 304, 288, 32) — exactly the DfM
    student's imitation grid. Built on ops/sparse_conv.py static-
    capacity gather/matmul convolutions.
    """
    sparse_shape: Tuple[int, int, int] = (41, 1216, 1152)
    base_channels: int = 16
    output_channels: int = 32
    capacity_scale: float = 1.0   # multiplies per-level capacities
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, keys, feats, vmask, train: bool = False):
        """keys (B, V) sorted flat ids; feats (B, V, 3); vmask (B, V).

        Returns dense volume (B, 5, 304, 288, 32)."""
        from ...ops.sparse_conv import (neighbor_table,
                                        sparse_conv_downsample,
                                        sparse_to_dense, subm_conv)
        b, v = keys.shape
        grid = self.sparse_shape

        def bn_relu(x, m, name, act=True):
            x = SparseBN(x.shape[-1], dtype=self.dtype,
                         name=name)(x, m, train)
            return nn.relu(x) if act else x

        def subm(x, nbr, cin, cout, name):
            w = _SpKernel(27, cin, cout, name=name)()
            return jax.vmap(lambda f, nb: subm_conv(
                f.astype(self.dtype), nb,
                w.astype(self.dtype)))(x, nbr)

        # level 0 (full res): conv_input + stage1
        nbr0 = jax.vmap(lambda k, m: neighbor_table(k, m, grid))(
            keys, vmask)
        x = subm(feats, nbr0, feats.shape[-1], self.base_channels,
                 'conv_input')
        x = bn_relu(x, vmask, 'bn_input')
        x = subm(x, nbr0, 16, 16, 'enc0_0')
        x = bn_relu(x, vmask, 'bn0_0')

        specs = [  # (stride, padding, channels, capacity_frac)
            ((2, 2, 2), (1, 1, 1), (16, 32, 32, 32), 0.5),
            ((2, 2, 2), (1, 1, 1), (32, 64, 64, 64), 0.25),
            ((2, 1, 1), (0, 1, 1), (64, 64, 64, 64), 0.5),
        ]
        cur_grid = grid
        for s, (stride, pad, chs, frac) in enumerate(specs):
            cap = max(int(v * frac * self.capacity_scale) // 8 * 8, 8)
            og = tuple((g + 2 * p - 3) // st + 1 for g, st, p in
                       zip(cur_grid, stride, pad))
            def down(k, m, _g=cur_grid, _s=stride, _p=pad, _c=cap):
                r = sparse_conv_downsample(k, m, _g, _s, _p, _c)
                return r[0], r[1], r[3]     # drop the static out-grid
            ok, om, gat = jax.vmap(down)(keys, vmask)
            x = subm(x, gat, chs[0], chs[1], f'enc{s + 1}_down')
            x = bn_relu(x, om, f'bn{s + 1}_down')
            keys, vmask, cur_grid = ok, om, og
            nbr = jax.vmap(lambda k, m: neighbor_table(k, m, cur_grid))(
                keys, vmask)
            for j in (1, 2):
                x = subm(x, nbr, chs[j], chs[j + 1], f'enc{s + 1}_{j}')
                x = bn_relu(x, vmask, f'bn{s + 1}_{j}')

        # conv_out: 1x1, order=('conv',) — plain matmul, no norm/act
        w = _SpKernel(1, 64, self.output_channels, name='conv_out')()
        x = jnp.einsum('bvc,co->bvo', x.astype(self.dtype),
                       w[0].astype(self.dtype))
        x = x * vmask[..., None]
        return jax.vmap(lambda k, m, f: sparse_to_dense(
            k, m, f, cur_grid))(keys, vmask, x)


class SparseLidarTeacher(nn.Module):
    """LidarTeacher with the reference's true 0.05 m sparse encoder.

    Same output interface as `LidarTeacher` (volume_features at the
    0.2 m imitation grid + BEV features), but the volume comes from the
    submanifold encoder instead of the dense 0.2 m substitute."""
    point_cloud_range: Tuple[float, ...] = (2, -30.4, -3, 59.6, 30.4, 1)
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    sparse_shape: Tuple[int, int, int] = (41, 1216, 1152)
    capacity: int = 24576
    max_points: int = 5
    bev_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        from ...ops.sparse_conv import sparse_voxelize_mean
        pcr = jnp.asarray(self.point_cloud_range)
        keys, feats, vmask = jax.vmap(
            lambda p, m: sparse_voxelize_mean(
                p, m, pcr, self.voxel_size, self.sparse_shape,
                self.capacity, self.max_points))(points, point_mask)
        vol = SparseEncoder05(sparse_shape=self.sparse_shape,
                              dtype=self.dtype,
                              name='middle_encoder')(keys, feats, vmask,
                                                     train)
        b, nz, ny, nx, c = vol.shape
        bev = vol.transpose(0, 2, 3, 1, 4).reshape(b, ny, nx, nz * c)
        _, bev_feat = BEVHourglass(out_channels=self.bev_channels,
                                   norm='bn', dtype=self.dtype,
                                   name='bev')(bev, train)
        return vol, bev_feat
