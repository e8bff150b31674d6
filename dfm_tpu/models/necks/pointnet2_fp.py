"""PointNet++ feature-propagation neck.

Equivalent of the reference's `PointNetFPNeck`
(mmdet3d/models/necks/pointnet2_fp_neck.py:10-80): walks the SA
hierarchy coarse-to-fine, at each step 3-NN inverse-distance
interpolating the coarser level's features onto the finer level's
points, concatenating the skip features and applying an MLP
(ops in backbones/pointnet2.py:FPModule — static shapes, vmapped
3-NN).

Input is the backbone's dict(sa_xyz=[...], sa_features=[...]) with
level 0 = the raw points; returns dict(fp_xyz, fp_features) at level 0.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.pointnet2 import FPModule

__all__ = ['PointNetFPNeck']


class PointNetFPNeck(nn.Module):
    """fp_channels: per-step MLP widths, coarsest step first
    (reference default ((1536, 512, 512), (768, 512, 512),
    (608, 256, 256), (257, 128, 128)))."""
    fp_channels: Tuple[Tuple[int, ...], ...] = (
        (512, 512), (512, 512), (256, 256), (128, 128))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_dict, train: bool = False):
        sa_xyz = feat_dict['sa_xyz']
        sa_feats = feat_dict['sa_features']
        assert len(self.fp_channels) == len(sa_xyz) - 1
        x = sa_feats[-1]
        xyz = sa_xyz[-1]
        for i, mlp in enumerate(self.fp_channels):
            lvl = len(sa_xyz) - 2 - i
            x = FPModule(tuple(mlp), dtype=self.dtype,
                         name=f'fp{i}')(sa_xyz[lvl], sa_feats[lvl],
                                        xyz, x, train=train)
            xyz = sa_xyz[lvl]
        return dict(fp_xyz=xyz, fp_features=x)
