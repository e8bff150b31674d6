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
