"""MonoFlex monocular detector (DLA-34 + MonoFlexHead).

Equivalent of the reference's inherited MonoFlex configuration
(mmdet3d: SMOKEMono3D-style single-stage wrapper over
dense_heads/monoflex_head.py with a DLA-34 trunk).
"""

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.dla import DLANet
from ..heads.monoflex import (MonoFlexConfig, MonoFlexHead,
                              monoflex_decode, monoflex_loss)
from ..necks.dla_neck import DLANeck

__all__ = ['MonoFlex', 'MonoFlexConfig', 'monoflex_loss',
           'monoflex_predict']


class MonoFlex(nn.Module):
    cfg: MonoFlexConfig = dataclasses.field(
        default_factory=MonoFlexConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        feats = DLANet(norm='bn', dtype=self.dtype,
                       name='backbone')(img.astype(self.dtype), train)
        feat = DLANeck(use_dcn=True, norm='bn', dtype=self.dtype,
                       name='neck')(feats, train)
        return MonoFlexHead(self.cfg, norm='gn', dtype=self.dtype,
                            name='bbox_head')(feat, train)


def monoflex_predict(outs, cam2img, cfg: MonoFlexConfig):
    """Batched decode (vmap over samples)."""
    return jax.vmap(lambda o, c: monoflex_decode(o, c, cfg))(
        outs, cam2img)
