"""SPP + U-Net neck (flax), LIGA-style.

Equivalent of the reference's `SPPUNetNeck`
(mmdet3d/models/necks/spp_unet_neck.py:14-119): four average-pool SPP
branches over the last backbone stage, bilinear (align-corners)
upsampled and concatenated with the stride-4 stages, then

* an upconv decoder back to full image resolution -> `stereo_feature`
  (feeds the plane-sweep cost volume), and
* a 2-conv `sem_feature` head at stride 4 (feeds the 2D aux head and
  the voxel concat).
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..layers import Conv2D, ConvNorm, UpconvModule
from ...ops.resize import avg_pool_2d, resize_linear


class SPPUNetNeck(nn.Module):
    """Input: [img, stage0, stage1, stage2, stage3] features (channels-last).

    Returns (stereo_feature, sem_feature).
    """
    start_level: int = 2
    spp_channel: int = 32
    sem_channels: Tuple[int, int] = (128, 32)
    stereo_channels: Tuple[int, int] = (32, 32)
    with_upconv: bool = True
    cat_img_feature: bool = True
    norm: str = 'gn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        target_hw = feats[self.start_level].shape[1:3]
        last = feats[-1]
        spp = []
        for s in (64, 32, 16, 8):
            # guard tiny test inputs: pool window <= feature size
            win = (min(s, last.shape[1]), min(s, last.shape[2]))
            x = avg_pool_2d(last, win)
            x = ConvNorm(self.spp_channel, (1, 1), norm=self.norm,
                         dtype=self.dtype)(x, train)
            x = resize_linear(x, target_hw, axes=(1, 2), align_corners=True)
            spp.append(x)

        concat = jnp.concatenate(
            list(feats[self.start_level:]) + spp, axis=-1)

        stereo = concat
        if self.with_upconv:
            # reference upconv_module hard-codes (Sync)BN in its convbn
            # blocks regardless of the neck norm_cfg
            # (conv_modules.py:46-62); match it for checkpoint parity
            stereo = UpconvModule(up_channels=(64, 32), norm='bn',
                                  dtype=self.dtype)(
                [stereo, feats[1], feats[0]], train)
        stereo = ConvNorm(self.stereo_channels[0], (3, 3), norm=self.norm,
                          dtype=self.dtype)(stereo, train)
        # Conv2D: W-folded lowering for the narrow full-res 1x1
        # (layers.py Conv2D; param tree identical to nn.Conv)
        stereo = Conv2D(self.stereo_channels[1], (1, 1), use_bias=False,
                        dtype=self.dtype, name='Conv_0')(stereo)

        sem = None
        if self.cat_img_feature:
            sem = ConvNorm(self.sem_channels[0], (3, 3), norm=self.norm,
                           dtype=self.dtype)(concat, train)
            sem = ConvNorm(self.sem_channels[1], (3, 3), norm=self.norm,
                           dtype=self.dtype)(sem, train)
        return stereo, sem
