"""OutdoorImVoxelNeck (flax).

Equivalent of the reference's `OutdoorImVoxelNeck`
(mmdet3d/models/necks/imvoxel_neck.py:9-117): three stages of
[residual 3D block + stride-2-in-z 3D conv] collapsing the voxel volume
(B, Nx, Ny, Nz, C) to a BEV map, channel-doubling per stage; output
transposed to the (B, Ny, Nx, C') order the anchor head expects.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..layers import ConvNorm


class ResModule3D(nn.Module):
    channels: int
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvNorm(self.channels, (3, 3, 3), norm=self.norm,
                       dtype=self.dtype)(x, train)
        out = ConvNorm(self.channels, (3, 3, 3), norm=self.norm, act=False,
                       dtype=self.dtype)(out, train)
        return nn.relu(x + out)


class OutdoorImVoxelNeck(nn.Module):
    in_channels: int = 64
    out_channels: int = 256
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """Args: x (B, Nz, Ny, Nx, C) volume. Returns (B, Ny, Nx, C_out)."""
        ch = self.in_channels
        for i in range(3):
            x = ResModule3D(ch, self.norm, self.dtype,
                            name=f'res{i}')(x, train)
            ch = ch * 2 if i < 2 else self.out_channels
            # stride 2 along z only; final stage flattens z completely
            sz = 2 if x.shape[1] > 1 else 1
            x = ConvNorm(ch, (3, 3, 3), strides=(sz, 1, 1), norm=self.norm,
                         dtype=self.dtype, name=f'down{i}')(x, train)
        # collapse remaining z
        x = x.mean(axis=1) if x.shape[1] > 1 else x[:, 0]
        return x
