"""Feature Pyramid Network (flax).

Equivalent of mmdet `FPN` as configured by the reference's mono path
(FCOS3D/PGD: 4 inputs -> 5 outputs, add_extra_convs='on_output',
relu_before_extra_convs) and DfM's neck_2d (1 input -> 5 outputs).
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resize import resize_linear


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: str = 'on_output'
    relu_before_extra_convs: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        feats = list(feats[self.start_level:])
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f'lateral{i}')(f)
            for i, f in enumerate(feats)
        ]
        # top-down (nearest upsample + add)
        for i in range(len(laterals) - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(laterals[i], 2, axis=1), 2, axis=2)
            up = up[:, :laterals[i - 1].shape[1], :laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=f'fpn_conv{i}')(laterals[i])
            for i in range(len(laterals))
        ]
        # extra levels from the last output (stride-2 convs)
        while len(outs) < self.num_outs:
            src = outs[-1]
            if self.relu_before_extra_convs and len(outs) > len(laterals):
                src = nn.relu(src)
            outs.append(
                nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f'extra_conv{len(outs)}')(src))
        return outs
