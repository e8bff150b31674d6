"""DLA neck (flax): DLAUp + IDAUp aggregation to a stride-4 map.

Equivalent of the reference's `DLANeck`
(mmdet3d/models/necks/dla_neck.py:29-233): iterative deep aggregation
upsamples each deeper level to the next shallower scale through a
projection conv, a bilinear x2 upsample and a node conv, repeated in
DLAUp pyramids and a final IDAUp over the top 3 scales.

Deviations from the reference, both documented:
  * the grouped transposed-conv upsampler (bilinear-initialized and
    frozen-shaped in practice, dla_neck.py:12-26 fill_up_weights) is an
    exact bilinear resize here;
  * the DCNv2 proj/node convs are used when `use_dcn` (our
    gather+bilinear DCN), plain convs otherwise.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resize import resize_linear
from ..backbones.resnet import DeformConv2d
from ..layers import apply_norm


class _ProjNode(nn.Module):
    ch: int
    use_dcn: bool = True
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        if self.use_dcn:
            x = DeformConv2d(self.ch, (3, 3), dtype=self.dtype,
                             name='dcn')(x)
        else:
            x = nn.Conv(self.ch, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=True, dtype=self.dtype)(x)
        x = apply_norm(self, x, self.norm, 32, train, dtype=self.dtype)
        return nn.relu(x)


class IDAUp(nn.Module):
    ch: int
    num_in: int
    use_dcn: bool = True
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train=False):
        """Aggregate feats[0..n-1] (shallow->deep) into feats[0]'s
        scale; returns the updated list."""
        feats = list(feats)
        for i in range(1, len(feats)):
            p = _ProjNode(self.ch, self.use_dcn, self.norm, self.dtype,
                          name=f'proj{i - 1}')(feats[i], train)
            hw = feats[i - 1].shape[1:3]
            up = resize_linear(p, hw, axes=(1, 2), align_corners=False)
            feats[i] = _ProjNode(self.ch, self.use_dcn, self.norm,
                                 self.dtype,
                                 name=f'node{i - 1}')(up + feats[i - 1],
                                                      train)
        return feats


class DLANeck(nn.Module):
    """Input: the 6 DLA level features; output: one stride-4 map."""
    in_channels: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    start_level: int = 2
    end_level: int = 5
    use_dcn: bool = True
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        lv = list(feats[self.start_level:self.end_level + 1])
        # DLAUp: repeated IDAUp pyramids, deepest levels first
        n = len(lv)
        for k in range(n - 1):
            ch = lv[n - 2 - k].shape[-1]
            agg = IDAUp(ch, k + 2, self.use_dcn, self.norm, self.dtype,
                        name=f'dla_up{k}')(lv[n - 2 - k:], train)
            lv[n - 2 - k:] = agg
        # final IDAUp to the start level's scale
        out = IDAUp(lv[0].shape[-1], 3, self.use_dcn, self.norm,
                    self.dtype, name='ida_up')(lv[:3], train)
        return out[-1]
