"""SECONDFPN neck (flax).

Equivalent of the reference's `SECONDFPN`
(mmdet3d/models/necks/second_fpn.py:12-91): per input level, a
transposed conv (or stride conv when upsample_stride < 1) to a common
resolution, then channel concat.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..layers import ConvNorm, ConvTransposeNorm, apply_norm


class SECONDFPN(nn.Module):
    out_channels: Sequence[int] = (256, 256)
    upsample_strides: Sequence[int] = (1, 2)
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        outs = []
        for i, (x, ch, st) in enumerate(zip(feats, self.out_channels,
                                            self.upsample_strides)):
            if st > 1:
                # reference uses ConvTranspose2d(k=st, s=st) + BN + ReLU
                x = nn.ConvTranspose(ch, (st, st), strides=(st, st),
                                     use_bias=False, dtype=self.dtype,
                                     name=f'deblock{i}_conv')(
                                         x.astype(self.dtype))
                x = apply_norm(self, x, self.norm, 32, train,
                               dtype=self.dtype)
                x = nn.relu(x)
            else:
                x = ConvNorm(ch, (1, 1), norm=self.norm, dtype=self.dtype,
                             name=f'deblock{i}')(x, train)
            outs.append(x)
        return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
