"""DLA-34 backbone (flax).

Equivalent of the reference's `DLANet`
(mmdet3d/models/backbones/dla.py:279-446, arch 34: BasicBlock,
levels (1, 1, 1, 2, 2, 1), channels (16, 32, 64, 128, 256, 512),
level_root (False, True, True, True)): hierarchical deep aggregation
with recursive Trees whose Roots concatenate children and apply a 1x1
conv; used by the SMOKE / MonoFlex monocular path.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..layers import apply_norm


class _ConvNormRelu(nn.Module):
    ch: int
    k: int = 3
    stride: int = 1
    dilation: int = 1
    norm: str = 'bn'
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dilation
        p = d * (self.k // 2)
        x = nn.Conv(self.ch, (self.k, self.k),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(d, d), padding=[(p, p), (p, p)],
                    use_bias=False, dtype=self.dtype)(x)
        x = apply_norm(self, x, self.norm, 32, train, dtype=self.dtype)
        return nn.relu(x) if self.relu else x


class DLABasicBlock(nn.Module):
    ch: int
    stride: int = 1
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, identity=None, train=False):
        if identity is None:
            identity = x
        out = _ConvNormRelu(self.ch, stride=self.stride, norm=self.norm,
                            dtype=self.dtype)(x, train)
        out = _ConvNormRelu(self.ch, norm=self.norm, relu=False,
                            dtype=self.dtype)(out, train)
        return nn.relu(out + identity)


class Root(nn.Module):
    ch: int
    add_identity: bool = False
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train=False):
        x = jnp.concatenate(feats, axis=-1)
        x = nn.Conv(self.ch, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        x = apply_norm(self, x, self.norm, 32, train, dtype=self.dtype)
        if self.add_identity:
            x = x + feats[0]
        return nn.relu(x)


class Tree(nn.Module):
    levels: int
    ch: int
    stride: int = 1
    level_root: bool = False
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, children=None, train=False):
        children = [] if children is None else list(children)
        bottom = nn.max_pool(x, (self.stride, self.stride),
                             strides=(self.stride, self.stride)) \
            if self.stride > 1 else x
        if bottom.shape[-1] != self.ch:
            identity = nn.Conv(self.ch, (1, 1), use_bias=False,
                               dtype=self.dtype, name='project')(bottom)
            identity = apply_norm(self, identity, self.norm, 32, train,
                                  dtype=self.dtype)
        else:
            identity = bottom
        if self.level_root:
            children.append(bottom)
        if self.levels == 1:
            x1 = DLABasicBlock(self.ch, self.stride, self.norm,
                               self.dtype, name='tree1')(x, identity, train)
            x2 = DLABasicBlock(self.ch, 1, self.norm, self.dtype,
                               name='tree2')(x1, None, train)
            return Root(self.ch, norm=self.norm, dtype=self.dtype,
                        name='root')([x2, x1] + children, train)
        x1 = Tree(self.levels - 1, self.ch, self.stride, False,
                  self.norm, self.dtype, name='tree1')(x, None, train)
        children.append(x1)
        return Tree(self.levels - 1, self.ch, 1, False, self.norm,
                    self.dtype, name='tree2')(x1, children, train)


class DLANet(nn.Module):
    """DLA-34; returns features of all 6 levels (strides 1..32)."""
    depth: int = 34
    channels: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    levels: Tuple[int, ...] = (1, 1, 1, 2, 2, 1)
    level_root: Tuple[bool, ...] = (False, True, True, True)
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        ch = self.channels
        x = _ConvNormRelu(ch[0], k=7, norm=self.norm,
                          dtype=self.dtype, name='base_layer')(x, train)
        outs = []
        x = _ConvNormRelu(ch[0], norm=self.norm, dtype=self.dtype,
                          name='level0')(x, train)
        outs.append(x)
        x = _ConvNormRelu(ch[1], stride=2, norm=self.norm,
                          dtype=self.dtype, name='level1')(x, train)
        outs.append(x)
        for i in range(4):
            x = Tree(self.levels[i + 2], ch[i + 2], stride=2,
                     level_root=self.level_root[i], norm=self.norm,
                     dtype=self.dtype, name=f'level{i + 2}')(x, None, train)
            outs.append(x)
        return outs
