"""BEV hourglass backbone (flax).

Equivalent of the reference's `BEVHourglass`
(mmdet3d/models/backbones/bev_hourglass.py:12-46): a 3x3 compress conv
followed by one 2D hourglass; returns (pre-hourglass, post-hourglass)
features. Used both as DfM's `backbone_3d` (after height compression)
and as the BEV backbone of the SECOND teacher.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..layers import ConvNorm, Hourglass


class BEVHourglass(nn.Module):
    out_channels: int = 64
    norm: str = 'gn'
    output_prehg_feat: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvNorm(self.out_channels, (3, 3), norm=self.norm,
                     dtype=self.dtype, name='compress')(x, train)
        pre = x
        x, _, _ = Hourglass(self.out_channels, ndim=2, norm=self.norm,
                            dtype=self.dtype, name='hg')(x, train=train)
        if self.output_prehg_feat:
            return pre, x
        return x
