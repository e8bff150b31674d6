"""Standard ResNet-50/101 backbone (flax), for the mono path.

Equivalent of mmdet `ResNet` as used by FCOS3D / PGD / MV-FCOS3D++:
R101 with DCNv2 on stages 2-4 in the reference configs
(multiview-dfm...camsync.py:16, stage_with_dcn=(False, True, True,
True)). The deformable stages use the XLA-native gather+bilinear
DCNv2 (dfm_tpu.ops.deform_conv).
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..layers import apply_norm
from ...ops.deform_conv import deform_conv2d

STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
BASIC_DEPTHS = (18, 34)


class DeformConv2d(nn.Module):
    """DCNv2 layer: zero-init offset/mask conv + deformable conv.

    mmcv's ModulatedDeformConv2dPack splits its 3K offset-conv channels
    as chunk(o1, o2, mask); here the layout is [2K interleaved (dy, dx);
    K mask logits] — an importer must permute accordingly.
    """
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        k = kh * kw
        off = nn.Conv(3 * k, self.kernel_size, strides=self.strides,
                      padding=[(self.dilation * (kh // 2),) * 2,
                               (self.dilation * (kw // 2),) * 2],
                      kernel_dilation=(self.dilation,) * 2,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      dtype=self.dtype, name='conv_offset')(x)
        offset = off[..., :2 * k].astype(jnp.float32)
        mask = nn.sigmoid(off[..., 2 * k:].astype(jnp.float32))
        weight = self.param('kernel', nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features),
                            jnp.float32)
        out = deform_conv2d(x.astype(self.dtype), offset, mask,
                            weight.astype(self.dtype),
                            stride=self.strides[0], dilation=self.dilation)
        return out.astype(self.dtype)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dcn: bool = False
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        d = self.dilation
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      dtype=self.dtype)(x)
        out = apply_norm(self, out, self.norm, 32, train, dtype=self.dtype)
        out = nn.relu(out)
        if self.dcn:
            out = DeformConv2d(self.planes, (3, 3),
                               strides=(self.stride,) * 2,
                               dilation=d, dtype=self.dtype,
                               name='conv2_dcn')(out)
        else:
            out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                          kernel_dilation=(d, d), padding=[(d, d), (d, d)],
                          use_bias=False, dtype=self.dtype)(out)
        out = apply_norm(self, out, self.norm, 32, train, dtype=self.dtype)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = apply_norm(self, out, self.norm, 32, train, dtype=self.dtype)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype)(x)
            identity = apply_norm(self, identity, self.norm, 32, train,
                                  dtype=self.dtype)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    """Two-conv residual block (ResNet-18/34; mmdet BasicBlock)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dcn: bool = False
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        d = self.dilation
        if self.dcn:
            out = DeformConv2d(self.planes, (3, 3),
                               strides=(self.stride,) * 2, dilation=d,
                               dtype=self.dtype, name='conv1_dcn')(x)
        else:
            out = nn.Conv(self.planes, (3, 3),
                          strides=(self.stride,) * 2,
                          kernel_dilation=(d, d), padding=[(d, d), (d, d)],
                          use_bias=False, dtype=self.dtype)(x)
        out = apply_norm(self, out, self.norm, 32, train, dtype=self.dtype)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), kernel_dilation=(d, d),
                      padding=[(d, d), (d, d)], use_bias=False,
                      dtype=self.dtype)(out)
        out = apply_norm(self, out, self.norm, 32, train, dtype=self.dtype)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype)(x)
            identity = apply_norm(self, identity, self.norm, 32, train,
                                  dtype=self.dtype)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet-18/34/50/101/152; returns stage features (strides 4, 8,
    16, 32). 18/34 use BasicBlock (expansion 1), deeper use Bottleneck
    (expansion 4), matching mmdet ResNet."""
    depth: int = 101
    base_channels: int = 64
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    dilations: Tuple[int, ...] = (1, 1, 1, 1)
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    # per-stage DCNv2 (reference camsync config: (False, True, True, True))
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype)(x)
        x = apply_norm(self, x, self.norm, 32, train, dtype=self.dtype)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outs = []
        basic = self.depth in BASIC_DEPTHS
        block_cls = BasicBlock if basic else Bottleneck
        expansion = 1 if basic else 4
        in_planes = self.base_channels
        for i, num_blocks in enumerate(STAGE_BLOCKS[self.depth]):
            planes = self.base_channels * 2**i
            for b in range(num_blocks):
                stride = self.strides[i] if b == 0 else 1
                need_ds = b == 0 and (stride != 1 or
                                      in_planes != planes * expansion)
                x = block_cls(planes=planes, stride=stride,
                              dilation=self.dilations[i],
                              downsample=need_ds,
                              dcn=self.stage_with_dcn[i], norm=self.norm,
                              dtype=self.dtype,
                              name=f'layer{i + 1}_block{b}')(x, train)
                in_planes = planes * expansion
            if i in self.out_indices:
                outs.append(x)
        return outs
