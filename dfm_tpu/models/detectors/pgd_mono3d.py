"""PGD monocular detector composite (ResNet + FPN + PGDHead).

Equivalent of the reference's PGD configuration of
`SingleStageMono3DDetector` (configs/pgd/*.py: mmdet ResNet ->
FPN -> PGDHead, dense_heads/pgd_head.py:17). The head adds the
probabilistic-depth classifier, uncertainty weights, keypoint and 2D
branches on top of FCOS3D (heads/pgd.py).
"""

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.resnet import ResNet
from ..heads.fcos_mono3d import fcos3d_get_bboxes
from ..heads.pgd import PGDConfig, PGDHead, pgd_loss
from ..necks.fpn import FPN
from .fcos_mono3d import mono_level_points

__all__ = ['PGDMono3D', 'pgd_mono3d_loss', 'pgd_mono3d_predict']


class PGDMono3D(nn.Module):
    cfg: PGDConfig = dataclasses.field(default_factory=PGDConfig)
    backbone_depth: int = 101
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        feats = ResNet(depth=self.backbone_depth, norm='bn',
                       dtype=self.dtype, name='backbone')(img, train)
        fpn = FPN(out_channels=self.cfg.in_channels, num_outs=5,
                  start_level=1, dtype=self.dtype, name='neck')(feats, train)
        return PGDHead(cfg=self.cfg, dtype=self.dtype,
                       name='bbox_head')(fpn, train)


def pgd_mono3d_loss(level_outs, img_hw, batch, cfg: PGDConfig,
                    cam2img=None, axis_name=None):
    pts = mono_level_points(img_hw, cfg)
    losses = pgd_loss(level_outs, pts, cfg, batch, cam2img=cam2img,
                      axis_name=axis_name)
    return sum(losses.values()), losses


def pgd_mono3d_predict(level_outs, img_hw, cam2img, cfg: PGDConfig):
    pts = mono_level_points(img_hw, cfg)
    return fcos3d_get_bboxes(level_outs, pts, cam2img, cfg)
