"""DfM + frozen LiDAR teacher + imitation adapters (training composite).

Composes the pieces the reference wires inside `DfM.__init__`/
`forward_train` when `lidar_model`/`imitation_cfgs` are configured
(detectors/dfm.py:72-109, 358-370): the student DfM, the teacher, and
the learnable conv adapters, producing the feature pairs for
`imitation_loss`. Teacher parameters are frozen by `stop_gradient` on
its outputs (the reference sets requires_grad_(False)).
"""

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .dfm import BatchMeta, DfM, DfMConfig, dfm_loss
from .imitation import ImitationAdapter, imitation_loss
from .teacher import LidarTeacher


class DfMWithTeacher(nn.Module):
    cfg: DfMConfig = dataclasses.field(default_factory=DfMConfig)
    dtype: Any = jnp.float32
    # 'dense' = 0.2 m dense encoder substitute; 'sparse' = the
    # reference's true 0.05 m submanifold encoder (teacher.py:
    # SparseLidarTeacher, ops/sparse_conv.py)
    teacher_encoder: str = 'dense'

    @nn.compact
    def __call__(self, img, meta: BatchMeta, points=None, point_mask=None,
                 train: bool = False):
        cfg = self.cfg
        outputs = DfM(cfg=cfg, dtype=self.dtype, name='dfm')(
            img, meta, train)
        if points is not None:
            if self.teacher_encoder == 'sparse':
                from .teacher import SparseLidarTeacher
                t_vol, t_bev = SparseLidarTeacher(
                    point_cloud_range=cfg.point_cloud_range,
                    bev_channels=cfg.bev_channels,
                    dtype=self.dtype, name='lidar_teacher')(
                        points, point_mask, train)
            else:
                t_vol, t_bev = LidarTeacher(
                    point_cloud_range=cfg.point_cloud_range,
                    voxel_size=cfg.voxel_size,
                    volume_channels=cfg.cv_channels,
                    bev_channels=cfg.bev_channels,
                    dtype=self.dtype, name='lidar_teacher')(
                        points, point_mask, train)
            outputs['imitation'] = dict(
                bev_pred=ImitationAdapter(cfg.bev_channels, self.dtype,
                                          name='imit_bev')(
                    outputs['bev_feat']),
                bev_target=jax.lax.stop_gradient(t_bev),
                volume_pred=ImitationAdapter(cfg.cv_channels, self.dtype,
                                             name='imit_vol')(
                    outputs['volume_feat']),
                volume_target=jax.lax.stop_gradient(t_vol))
        return outputs


def bev_cell_centers(cfg: DfMConfig):
    """(Ny*Nx, 2) BEV cell centers for the in-box imitation masks
    (reference uses the first anchor's centers, dfm.py:480-487)."""
    nz, ny, nx = cfg.voxel_grid_size()
    r = cfg.anchor_ranges[0]
    xs = np.linspace(r[0], r[3], nx, dtype=np.float32)
    ys = np.linspace(r[1], r[4], ny, dtype=np.float32)
    yy, xx = np.meshgrid(ys, xs, indexing='ij')
    return np.stack([xx, yy], -1).reshape(-1, 2)


def dfm_loss_with_imitation(outputs, batch, cfg: DfMConfig, rng,
                            imitation_weight=1.0, axis_name=None):
    """dfm_loss + the two imitation terms (BEV + volume pairs,
    reference imitation_cfgs in configs/dfm/dfm_r34...py:183-204)."""
    total, losses = dfm_loss(outputs, batch, cfg, rng, axis_name=axis_name)
    if 'imitation' in outputs:
        im = outputs['imitation']
        centers = jnp.asarray(bev_cell_centers(cfg))
        l_bev = imitation_loss(
            im['bev_pred'], im['bev_target'], centers,
            batch['gt_boxes'], batch['gt_mask'],
            normalizer_clamp_value=cfg.normalizer_clamp_value,
            axis_name=axis_name)
        l_vol = imitation_loss(
            im['volume_pred'], im['volume_target'], centers,
            batch['gt_boxes'], batch['gt_mask'],
            normalizer_clamp_value=cfg.normalizer_clamp_value,
            axis_name=axis_name)
        losses['loss_imitation'] = imitation_weight * (l_bev + l_vol)
        total = total + losses['loss_imitation']
    return total, losses
