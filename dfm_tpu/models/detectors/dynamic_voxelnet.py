"""DynamicVoxelNet LiDAR detector.

Equivalent of the reference's `DynamicVoxelNet`
(mmdet3d/models/detectors/dynamic_voxelnet.py, 71 LoC): VoxelNet with
*dynamic* voxelization — every point contributes to its voxel's mean
feature (no per-voxel point cap). On TPU the distinction is just the
`max_points` argument of the scatter-mean (`teacher.voxelize_mean`):
hard voxelization caps arrival-ordered points per voxel, dynamic does
not; the network trunk is identical to `VoxelNet`.
"""

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .voxelnet import (VoxelNet, VoxelNetConfig, voxelnet_loss,
                       voxelnet_predict)

__all__ = ['DynamicVoxelNet', 'DynamicVoxelNetConfig',
           'dynamic_voxelnet_loss', 'dynamic_voxelnet_predict']


@dataclasses.dataclass(frozen=True)
class DynamicVoxelNetConfig(VoxelNetConfig):
    pass


class DynamicVoxelNet(nn.Module):
    """Same trunk as VoxelNet; the dense scatter-mean already implements
    dynamic (uncapped) voxelization, so this wrapper only pins the
    semantic and keeps the reference's detector inventory name."""
    cfg: DynamicVoxelNetConfig = dataclasses.field(
        default_factory=DynamicVoxelNetConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        return VoxelNet(cfg=self.cfg, dtype=self.dtype,
                        name='voxelnet')(points, point_mask, train)


dynamic_voxelnet_loss = voxelnet_loss
dynamic_voxelnet_predict = voxelnet_predict
