"""LIGA-Stereo ResNet image backbone (flax).

Architectural equivalent of the reference's `LIGAResNet`
(mmdet3d/models/backbones/liga_resnet.py:308-483): a torch ResNet-34
variant with custom per-stage strides (1,2,1,1), dilations (1,1,2,4),
channel factors (1,2,2,2), no stem max-pool, and residual blocks without
the post-add ReLU. Output: one feature map per stage (strides 2,4,4,4).

BatchNorm here is the reference's SyncBN; under pjit data parallelism the
batch reduction is global so plain BatchNorm suffices (SURVEY.md 2.9).
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..layers import Conv2DStride2, apply_norm

STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}


class LigaBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    with_out_relu: bool = False
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        d = self.dilation
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      kernel_dilation=(d, d), padding=[(d, d), (d, d)],
                      use_bias=False, dtype=self.dtype)(x)
        out = apply_norm(self, out, self.norm, 32, train, dtype=self.dtype)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, dtype=self.dtype)(out)
        out = apply_norm(self, out, self.norm, 32, train, dtype=self.dtype)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype)(x)
            identity = apply_norm(self, identity, self.norm, 32, train,
                                  dtype=self.dtype)
        out = out + identity
        if self.with_out_relu:
            out = nn.relu(out)
        return out


class LIGAResNet(nn.Module):
    """ResNet-18/34 with LIGA modifications; returns per-stage features."""
    depth: int = 34
    base_channels: int = 64
    strides: Tuple[int, ...] = (1, 2, 1, 1)
    dilations: Tuple[int, ...] = (1, 1, 2, 4)
    num_channels_factor: Tuple[int, ...] = (1, 2, 2, 2)
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    with_max_pool: bool = False
    block_with_final_relu: bool = False
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        # stem: 7x7 stride-2 (space-to-depth lowered on TPU bf16 —
        # layers.Conv2DStride2; param tree identical to nn.Conv)
        x = Conv2DStride2(self.base_channels, (7, 7),
                          dtype=self.dtype, name='Conv_0')(x)
        x = apply_norm(self, x, self.norm, 32, train, dtype=self.dtype)
        x = nn.relu(x)
        if self.with_max_pool:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1),
                                                                (1, 1)])
        outs = []
        in_planes = self.base_channels
        for i, num_blocks in enumerate(STAGE_BLOCKS[self.depth]):
            planes = self.base_channels * self.num_channels_factor[i]
            for b in range(num_blocks):
                stride = self.strides[i] if b == 0 else 1
                need_ds = b == 0 and (stride != 1 or in_planes != planes)
                x = LigaBasicBlock(
                    planes=planes, stride=stride, dilation=self.dilations[i],
                    downsample=need_ds,
                    with_out_relu=self.block_with_final_relu,
                    norm=self.norm, dtype=self.dtype,
                    name=f'layer{i + 1}_block{b}')(x, train)
            in_planes = planes
            if i in self.out_indices:
                outs.append(x)
        return outs
