"""DfMNeck (flax): dual-path mono/stereo BEV collapse with gated fusion.

Equivalent of the reference's `DfMNeck`
(mmdet3d/models/necks/dfm_neck.py:11-122), used by the 10-sweeps
MV-FCOS3D++ config: the input volume concatenates per-frame features
along channels; a mono path reads only the current frame's channels and
a stereo path reads all frames; each path is
[Res -> z-stride-2 conv] x2 -> Res -> z-valid conv (collapsing Nz to 1),
and a 1x1 Conv2d sigmoid gate fuses the two BEV maps.

Layout: volume (B, Nz, Ny, Nx, C_in * num_frames) channels-last
(reference: (N, C, Nx, Ny, Nz)); output (B, Ny, Nx, C_out) in the
anchor-head (y, x) order.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..layers import ConvNorm
from .imvoxel_neck import ResModule3D


class DfMNeck(nn.Module):
    in_channels: int = 64
    out_channels: int = 256
    num_frames: int = 2
    norm: str = 'bn'
    dtype: Any = jnp.float32

    def _path(self, x, chans: Sequence[int], tag, train):
        """Res + stride-2-in-z conv stages, final z-valid conv."""
        c0, c1, c2 = chans
        x = ResModule3D(x.shape[-1], self.norm, self.dtype,
                        name=f'{tag}_res0')(x, train)
        x = ConvNorm(c1, (3, 3, 3), strides=(2, 1, 1), norm=self.norm,
                     dtype=self.dtype, name=f'{tag}_down0')(x, train)
        x = ResModule3D(c1, self.norm, self.dtype,
                        name=f'{tag}_res1')(x, train)
        x = ConvNorm(c2, (3, 3, 3), strides=(2, 1, 1), norm=self.norm,
                     dtype=self.dtype, name=f'{tag}_down1')(x, train)
        x = ResModule3D(c2, self.norm, self.dtype,
                        name=f'{tag}_res2')(x, train)
        # final conv: padding (1,1) on y/x, VALID on z (reference
        # padding=(1, 1, 0)); collapses the remaining z extent
        nz = x.shape[1]
        x = nn.Conv(self.out_channels, (min(3, nz), 3, 3),
                    padding=[(0, 0), (1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name=f'{tag}_final_conv')(x)
        from ..layers import apply_norm
        x = apply_norm(self, x, self.norm, 32, train, dtype=self.dtype)
        x = nn.relu(x)
        x = x.mean(axis=1) if x.shape[1] > 1 else x[:, 0]
        return x                                   # (B, Ny, Nx, C_out)

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, Nz, Ny, Nx, C_in * num_frames); frame 0 (current)
        occupies the first C_in channels."""
        c = self.in_channels
        assert x.shape[-1] == c * self.num_frames, \
            f'expected {c}x{self.num_frames} channels, got {x.shape[-1]}'
        chans = (c, c * 2, c * 4)
        mono = self._path(x[..., :c], chans, 'mono', train)
        stereo = self._path(x, chans, 'stereo', train)
        gate_in = jnp.concatenate([mono, stereo], axis=-1)
        weight = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                         name='aggregate_layer')(gate_in)
        weight = nn.sigmoid(weight)
        return weight * mono + (1 - weight) * stereo
