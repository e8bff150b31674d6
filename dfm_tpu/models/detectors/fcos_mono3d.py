"""FCOS3D single-stage monocular detector (flax composite).

Equivalent of the reference's `FCOSMono3D` over
`SingleStageMono3DDetector` (mmdet3d/models/detectors/
{fcos_mono3d.py, single_stage_mono3d.py}): ResNet -> FPN ->
FCOSMono3DHead; loss and NMS post-processing are pure functions
(fcos3d_loss / fcos3d_get_bboxes).
"""

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.resnet import ResNet
from ..heads.fcos_mono3d import (FCOS3DConfig, FCOSMono3DHead,
                                 fcos3d_get_bboxes, fcos3d_loss,
                                 level_points)
from ..necks.fpn import FPN


class FCOSMono3D(nn.Module):
    cfg: FCOS3DConfig = dataclasses.field(default_factory=FCOS3DConfig)
    backbone_depth: int = 101
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        """Args: img (B, H, W, 3) normalized. Returns per-level outputs."""
        feats = ResNet(depth=self.backbone_depth, norm='bn',
                       dtype=self.dtype, name='backbone')(img, train)
        fpn = FPN(out_channels=self.cfg.in_channels, num_outs=5,
                  start_level=1, dtype=self.dtype, name='neck')(feats, train)
        return FCOSMono3DHead(cfg=self.cfg, dtype=self.dtype,
                              name='bbox_head')(fpn, train)


def mono_level_points(img_hw, cfg: FCOS3DConfig):
    """Per-level point arrays for an input size (H, W)."""
    h, w = img_hw
    return [
        level_points(((h + s - 1) // s, (w + s - 1) // s), s)
        for s in cfg.strides
    ]


def fcos_mono3d_loss(level_outs, img_hw, batch, cfg: FCOS3DConfig,
                     axis_name=None):
    pts = mono_level_points(img_hw, cfg)
    losses = fcos3d_loss(level_outs, pts, cfg, batch, axis_name=axis_name)
    return sum(losses.values()), losses


def fcos_mono3d_predict(level_outs, img_hw, cam2img, cfg: FCOS3DConfig):
    pts = mono_level_points(img_hw, cfg)
    return fcos3d_get_bboxes(level_outs, pts, cam2img, cfg)
