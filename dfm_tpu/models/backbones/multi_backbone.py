"""MultiBackbone: parallel point backbones + feature aggregation.

Equivalent of the reference's `MultiBackbone`
(mmdet3d/models/backbones/multi_backbone.py:17-127, used by H3DNet):
N point-cloud backbone streams run on the same input; their last FP
features are concatenated and lifted through a small 1x1 MLP into the
shared `hd_feature`. Per-stream outputs are suffixed (`_net0`, ...).

The streams here are `PointNet2SASSG` towers (the H3DNet recipe);
aggregation MLP channels default to the reference's
[sum, sum/2, sum/num_streams] rule.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .pointnet2 import PointNet2SASSG

__all__ = ['MultiBackbone']


class MultiBackbone(nn.Module):
    num_streams: int = 4
    suffixes: Tuple[str, ...] = ('net0', 'net1', 'net2', 'net3')
    sa_points: Tuple[int, ...] = (2048, 1024, 512, 256)
    sa_radii: Tuple[float, ...] = (0.2, 0.4, 0.8, 1.2)
    sa_ks: Tuple[int, ...] = (64, 32, 16, 16)
    sa_mlps: Tuple[Tuple[int, ...], ...] = (
        (64, 64, 128), (128, 128, 256), (128, 128, 256), (128, 128, 256))
    fp_channels: Tuple[Tuple[int, ...], ...] = ((256, 256), (256, 256))
    aggregation_mlp_channels: Tuple[int, ...] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points (B, N, 3+C) -> dict with per-stream fp_xyz_<suffix> /
        fp_features_<suffix> and the aggregated hd_feature (B, M, C')."""
        assert len(self.suffixes) == self.num_streams
        ret = {}
        fp_feats = []
        for i in range(self.num_streams):
            xyz, feats = PointNet2SASSG(
                sa_points=self.sa_points, sa_radii=self.sa_radii,
                sa_ks=self.sa_ks, sa_mlps=self.sa_mlps,
                fp_channels=self.fp_channels, dtype=self.dtype,
                name=f'backbone{i}')(points, train)
            sfx = self.suffixes[i]
            ret[f'fp_xyz_{sfx}'] = xyz
            ret[f'fp_features_{sfx}'] = feats
            fp_feats.append(feats)

        cat = jnp.concatenate(fp_feats, axis=-1)
        c = cat.shape[-1]
        # Reference default aggregation_mlp_channels includes the INPUT
        # width as its first entry ([sum, sum/2, sum/num]) and builds
        # len-1 convs, so the default tower is sum->sum/2->sum/num —
        # two layers, not three.
        mlp = tuple(self.aggregation_mlp_channels) or (
            c // 2, c // self.num_streams)
        x = cat
        for j, ch in enumerate(mlp):
            x = nn.Dense(ch, dtype=self.dtype, name=f'agg{j}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f'agg_bn{j}')(x)
            x = nn.relu(x)
        ret['hd_feature'] = x
        return ret
