"""RegNet backbone without a stem, for BEV feature maps (flax).

Equivalent of the reference's `NoStemRegNet`
(mmdet3d/models/backbones/nostem_regnet.py:8-84, subclassing mmdet's
RegNet with `_make_stem_layer` removed): the voxel encoder's output
already plays the stem's role, so the network is just the four RegNet
stages of grouped bottleneck blocks. Widths/depths come from the
RegNet quantized linear parameterization (w0, wa, wm, depth, group_w,
bot_mul) exactly as in `RegNet.generate_regnet` (mmdet
models/backbones/regnet.py), so config arches (e.g. regnetx_400mf:
w0=24, wa=24.48, wm=2.54, group_w=16, depth=22) produce the same
per-stage widths.

TPU notes: grouped convolutions lower to `feature_group_count`, which
XLA maps onto the MXU directly; channels-last throughout.
"""

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ['NoStemRegNet', 'generate_regnet']


def generate_regnet(w0, wa, wm, depth, q=8):
    """Per-block widths of the quantized linear RegNet rule.

    Returns (stage_widths tuple, stage_depths tuple). Matches mmdet
    `RegNet.generate_regnet` + `get_stages_from_blocks`.
    """
    assert wa >= 0 and w0 > 0 and wm > 1 and w0 % q == 0
    ks = np.round(np.log((np.arange(depth) * wa + w0) / w0) / np.log(wm))
    widths = (np.round(np.divide(w0 * np.power(wm, ks), q)) * q).astype(int)
    stage_widths, stage_depths = [], []
    for w in widths:
        if stage_widths and stage_widths[-1] == w:
            stage_depths[-1] += 1
        else:
            stage_widths.append(int(w))
            stage_depths.append(1)
    return tuple(stage_widths), tuple(stage_depths)


def _adjust_widths(stage_widths, group_w, bot_mul):
    """Round bottleneck widths to be divisible by their group width
    (mmdet `adjust_width_group`)."""
    ws, gs = [], []
    for w in stage_widths:
        bw = int(round(w * bot_mul))
        g = min(group_w, bw)
        bw = int(round(bw / g) * g)
        ws.append(int(bw / bot_mul))
        gs.append(g)
    return tuple(ws), tuple(gs)


class _Bottleneck(nn.Module):
    """RegNetX bottleneck: 1x1 -> 3x3 grouped (stride here) -> 1x1,
    BN after each, residual + relu."""
    width: int
    group: int
    bot_mul: float
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bw = int(round(self.width * self.bot_mul))

        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, dtype=self.dtype,
                                name=name)(h)

        ident = x
        h = nn.Conv(bw, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        h = nn.relu(bn(h, 'bn1'))
        h = nn.Conv(bw, (3, 3), strides=(self.stride, self.stride),
                    padding='SAME', feature_group_count=bw // self.group,
                    use_bias=False, dtype=self.dtype, name='conv2')(h)
        h = nn.relu(bn(h, 'bn2'))
        h = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv3')(h)
        h = bn(h, 'bn3')
        if self.stride != 1 or x.shape[-1] != self.width:
            ident = nn.Conv(self.width, (1, 1),
                            strides=(self.stride, self.stride),
                            use_bias=False, dtype=self.dtype,
                            name='downsample')(x)
            ident = bn(ident, 'dbn')
        return nn.relu(h + ident)


class NoStemRegNet(nn.Module):
    """Stages only; input (B, H, W, C) is consumed directly by stage 0
    (reference example: (1, 64, 16, 16) -> 4 levels)."""
    arch: Dict[str, float] = None
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        arch = self.arch or dict(w0=24, wa=24.48, wm=2.54,
                                 group_w=16, depth=22, bot_mul=1.0)
        widths, depths = generate_regnet(arch['w0'], arch['wa'],
                                         arch['wm'], int(arch['depth']))
        bot_mul = float(arch.get('bot_mul', 1.0))
        widths, groups = _adjust_widths(widths, int(arch['group_w']),
                                        bot_mul)
        outs = []
        for s, (w, d) in enumerate(zip(widths, depths)):
            for b in range(d):
                x = _Bottleneck(w, groups[s], bot_mul,
                                stride=self.strides[s] if b == 0 else 1,
                                dtype=self.dtype,
                                name=f'stage{s}_block{b}')(x, train)
            if s in self.out_indices:
                outs.append(x)
        return tuple(outs)
