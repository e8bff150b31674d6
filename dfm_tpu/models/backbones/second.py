"""SECOND BEV backbone (flax).

Equivalent of the reference's `SECOND`
(mmdet3d/models/backbones/second.py:10-91): per stage, one stride-s
conv followed by `layer_num` stride-1 convs (each Conv-BN-ReLU),
returning the feature map of every stage. Channels-last for TPU.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..layers import ConvNorm


class SECOND(nn.Module):
    out_channels: Sequence[int] = (128, 256)
    layer_nums: Sequence[int] = (5, 5)
    layer_strides: Sequence[int] = (1, 2)
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for s, (ch, n, st) in enumerate(zip(self.out_channels,
                                            self.layer_nums,
                                            self.layer_strides)):
            x = ConvNorm(ch, (3, 3), strides=(st, st), norm=self.norm,
                         dtype=self.dtype, name=f'stage{s}_conv0')(x, train)
            for i in range(n):
                x = ConvNorm(ch, (3, 3), norm=self.norm, dtype=self.dtype,
                             name=f'stage{s}_conv{i + 1}')(x, train)
            outs.append(x)
        return outs
