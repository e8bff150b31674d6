"""CenterPoint LiDAR detector (flax composite).

Equivalent of the reference's `CenterPoint`
(mmdet3d/models/detectors/centerpoint.py, 196 LoC: Voxelization ->
VFE -> middle encoder -> SECOND -> SECONDFPN -> CenterHead). TPU-native
path: scatter-mean voxelization onto a dense grid, dense 3D conv
encoder with z-collapse, SECOND/SECONDFPN BEV trunk, CenterHead with
gaussian-heatmap targets and circle-NMS decode
(heads/center_head.py).
"""

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..backbones.second import SECOND
from ..heads.center_head import (CenterHead, CenterHeadConfig,
                                 center_head_decode, center_head_loss)
from ..layers import ConvNorm
from ..necks.second_fpn import SECONDFPN
from .teacher import voxelize_mean

__all__ = ['CenterPoint', 'CenterPointConfig', 'centerpoint_loss',
           'centerpoint_predict']


@dataclasses.dataclass(frozen=True)
class CenterPointConfig:
    point_cloud_range: Tuple[float, ...] = (0.0, -40.0, -3.0, 70.4,
                                            40.0, 1.0)
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 0.4)
    max_points_per_voxel: int = 20
    encoder_channels: int = 64
    second_channels: Tuple[int, int] = (128, 256)
    second_layers: Tuple[int, int] = (5, 5)
    second_strides: Tuple[int, int] = (1, 2)
    fpn_channels: Tuple[int, int] = (256, 256)
    fpn_strides: Tuple[int, int] = (1, 2)
    head: CenterHeadConfig = dataclasses.field(
        default_factory=CenterHeadConfig)
    # global class ids per task (parallel to head.tasks)
    task_class_ids: Tuple[Tuple[int, ...], ...] = ((0,), (1, 2))

    @property
    def grid_size(self):
        pcr = self.point_cloud_range
        vx, vy, vz = self.voxel_size
        return (int(round((pcr[5] - pcr[2]) / vz)),
                int(round((pcr[4] - pcr[1]) / vy)),
                int(round((pcr[3] - pcr[0]) / vx)))


class CenterPoint(nn.Module):
    cfg: CenterPointConfig = dataclasses.field(
        default_factory=CenterPointConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        """points (B, P, 3+), point_mask (B, P) -> per-task head dicts."""
        cfg = self.cfg
        pcr = jnp.asarray(cfg.point_cloud_range)
        grid = cfg.grid_size

        vox, _ = jax.vmap(
            lambda p, m: voxelize_mean(p, m, pcr, cfg.voxel_size, grid,
                                       max_points=cfg.max_points_per_voxel)
        )(points, point_mask)                      # (B, Nz, Ny, Nx, C)
        vox = vox.astype(self.dtype)

        # dense middle encoder: 3D convs then z-collapse to BEV
        x = ConvNorm(cfg.encoder_channels, (3, 3, 3), norm='bn',
                     dtype=self.dtype, name='enc0')(vox, train)
        x = ConvNorm(cfg.encoder_channels, (3, 3, 3), norm='bn',
                     dtype=self.dtype, name='enc1')(x, train)
        b, nz, ny, nx, c = x.shape
        bev = x.transpose(0, 2, 3, 1, 4).reshape(b, ny, nx, nz * c)

        feats = SECOND(out_channels=cfg.second_channels,
                       layer_nums=cfg.second_layers,
                       layer_strides=cfg.second_strides, norm='bn',
                       dtype=self.dtype, name='backbone')(bev, train)
        neck = SECONDFPN(out_channels=cfg.fpn_channels,
                         upsample_strides=cfg.fpn_strides, norm='bn',
                         dtype=self.dtype, name='neck')(feats, train)
        return CenterHead(cfg=cfg.head, norm='bn', dtype=self.dtype,
                          name='bbox_head')(neck, train)


def centerpoint_loss(task_outs, batch, cfg: CenterPointConfig):
    return center_head_loss(task_outs, batch, cfg.head,
                            cfg.task_class_ids)


def centerpoint_predict(task_outs, cfg: CenterPointConfig):
    return center_head_decode(task_outs, cfg.head, cfg.task_class_ids)
