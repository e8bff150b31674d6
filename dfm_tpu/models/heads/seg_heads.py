"""Point-cloud semantic segmentation decode heads.

Equivalents of the reference's `Base3DDecodeHead` family
(mmdet3d/models/decode_heads/decode_head.py:12-123,
pointnet2_head.py:11-85, dgcnn_head.py:11-67, paconv_head.py:9-63):
each head maps backbone features to per-point class logits via feature
propagation + a pre-seg conv + dropout + a 1x1 classifier.

TPU-first differences: everything is channels-last (B, N, C) dense
matmuls (a Conv1d(k=1) IS a Dense over the point axis), static point
counts, and the loss lives in the segmentor (functional, not a method).
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.pointnet2 import FPModule

__all__ = ['PointNet2SegHead', 'PAConvSegHead', 'DGCNNSegHead']


class _ClsSeg(nn.Module):
    """pre_seg_conv + dropout + conv_seg (decode_head.py:55-58,
    cls_seg :103-108)."""
    channels: int
    num_classes: int
    dropout_ratio: float = 0.5
    negative_slope: float = 0.0      # LeakyReLU slope (DGCNN uses 0.2)
    bias: bool = True                # PAConv's pre-seg conv has none
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.channels, use_bias=self.bias, dtype=self.dtype,
                     name='pre_seg_conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name='pre_seg_bn')(x)
        x = nn.leaky_relu(x, self.negative_slope) \
            if self.negative_slope else nn.relu(x)
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(
                x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name='conv_seg')(x)


class PointNet2SegHead(nn.Module):
    """PointNet++ decoder head (reference pointnet2_head.py:11-85):
    walks the SA hierarchy coarse->fine with FP modules, then
    classifies. `skip_level0=True` keeps the raw input features as the
    finest skip connection (the PAConv variant, paconv_head.py:41-63);
    the PointNet++ default drops them (pointnet2_head.py:74-76).
    """
    num_classes: int
    fp_channels: Tuple[Tuple[int, ...], ...] = (
        (256, 256), (256, 256), (256, 128), (128, 128, 128))
    channels: int = 128
    dropout_ratio: float = 0.5
    skip_level0: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_dict, train: bool = False):
        """feat_dict: dict(sa_xyz=[...], sa_features=[...]) with level
        0 = the raw points. Returns (B, N, num_classes) logits."""
        sa_xyz = feat_dict['sa_xyz']
        sa_feats = list(feat_dict['sa_features'])
        if not self.skip_level0:
            sa_feats[0] = None
        assert len(self.fp_channels) == len(sa_xyz) - 1
        x = sa_feats[-1]
        xyz = sa_xyz[-1]
        for i, mlp in enumerate(self.fp_channels):
            lvl = len(sa_xyz) - 2 - i
            x = FPModule(tuple(mlp), dtype=self.dtype,
                         name=f'fp{i}')(sa_xyz[lvl], sa_feats[lvl],
                                        xyz, x, train=train)
            xyz = sa_xyz[lvl]
        return _ClsSeg(self.channels, self.num_classes,
                       self.dropout_ratio, dtype=self.dtype,
                       name='cls')(x, train)


class PAConvSegHead(PointNet2SegHead):
    """PAConv decoder head (paconv_head.py:9-63): PointNet2SegHead
    with the raw-feature skip at the finest level and a bias-free
    pre-seg conv."""
    skip_level0: bool = True

    @nn.compact
    def __call__(self, feat_dict, train: bool = False):
        sa_xyz = feat_dict['sa_xyz']
        sa_feats = list(feat_dict['sa_features'])
        x = sa_feats[-1]
        xyz = sa_xyz[-1]
        for i, mlp in enumerate(self.fp_channels):
            lvl = len(sa_xyz) - 2 - i
            x = FPModule(tuple(mlp), dtype=self.dtype,
                         name=f'fp{i}')(sa_xyz[lvl], sa_feats[lvl],
                                        xyz, x, train=train)
            xyz = sa_xyz[lvl]
        return _ClsSeg(self.channels, self.num_classes,
                       self.dropout_ratio, bias=False, dtype=self.dtype,
                       name='cls')(x, train)


class DGCNNSegHead(nn.Module):
    """DGCNN decoder head (dgcnn_head.py:11-67): one FP MLP over the
    concatenated edge-conv features, then classify. LeakyReLU(0.2)
    activations as in the reference config (_base_/models/dgcnn.py)."""
    num_classes: int
    fp_channels: Tuple[int, ...] = (512,)
    channels: int = 256
    dropout_ratio: float = 0.5
    negative_slope: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_dict, train: bool = False):
        """feat_dict: dict(fa_points=(B, N, C)). Returns logits."""
        x = feat_dict['fa_points'].astype(self.dtype)
        for i, ch in enumerate(self.fp_channels):
            x = nn.Dense(ch, dtype=self.dtype, name=f'fp_mlp{i}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f'fp_bn{i}')(x)
            x = nn.leaky_relu(x, self.negative_slope)
        return _ClsSeg(self.channels, self.num_classes,
                       self.dropout_ratio,
                       negative_slope=self.negative_slope,
                       dtype=self.dtype, name='cls')(x, train)
