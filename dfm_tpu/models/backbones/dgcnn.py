"""DGCNN backbone: dynamic-graph edge convolutions (flax).

Equivalent of the reference's `DGCNNBackbone`
(mmdet3d/models/backbones/dgcnn.py:10-98) built on `DGCNNGFModule` /
`DGCNNFAModule` (mmdet3d/ops/dgcnn_modules/): a stack of graph-feature
(edge-conv) modules whose kNN graph is recomputed per layer — on the
input coordinates for 'D-KNN', in the current feature space for
'F-KNN' — followed by a feature-aggregation module that concatenates
all GF outputs, lifts them with a shared MLP and appends the global
max-pooled descriptor to every point.

TPU-first: kNN is one (N, N) squared-distance matrix + `lax.top_k`
(N <= 8192 keeps it under 256 MB f32, and the matmul rides the MXU);
neighbor features come from a single batched row gather; the edge MLP
runs on the (N, K, 2C) tensor so XLA fuses the subtract/concat into
the first matmul. No dynamic shapes anywhere.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ['DGCNNBackbone', 'knn_indices']


def knn_indices(queries, keys, k):
    """Indices of the k nearest keys for every query (squared L2).

    Args:
        queries: (N, C); keys: (M, C).

    Returns:
        (N, k) int32. Ties broken by top_k's stable ordering; the
        query itself (distance 0) is included, matching the
        reference's `knn` op with identical point sets.
    """
    q2 = jnp.sum(queries * queries, axis=-1, keepdims=True)     # (N, 1)
    k2 = jnp.sum(keys * keys, axis=-1)                          # (M,)
    d2 = q2 + k2[None, :] - 2.0 * jnp.einsum(
        'nc,mc->nm', queries, keys,
        precision=jax.lax.Precision.HIGHEST)
    _, idx = jax.lax.top_k(-d2, k)
    return idx


class EdgeConv(nn.Module):
    """One graph-feature (GF) module: edge features
    [f_neighbor - f_center || f_center] -> shared MLP -> max over the
    k neighbors. `knn_mode` picks the graph metric: 'D-KNN' uses the
    last 3 feature dims (the xyz carried along), 'F-KNN' the full
    feature vector (reference dgcnn_gf_module.py:120-148)."""
    mlp_channels: Tuple[int, ...]
    k: int = 20
    knn_mode: str = 'F-KNN'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # feats: (B, N, C)
        def graph(f):
            key = f[..., -3:] if self.knn_mode == 'D-KNN' else f
            return knn_indices(key.astype(jnp.float32),
                               key.astype(jnp.float32), self.k)
        idx = jax.vmap(graph)(feats)                         # (B, N, k)
        nbr = jnp.take_along_axis(feats[:, :, None, :],
                                  idx[..., None], axis=1)    # (B, N, k, C)
        ctr = feats[:, :, None, :]
        x = jnp.concatenate([nbr - ctr,
                             jnp.broadcast_to(ctr, nbr.shape)], axis=-1)
        for i, ch in enumerate(self.mlp_channels):
            x = nn.Dense(ch, use_bias=False, dtype=self.dtype,
                         name=f'mlp{i}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f'bn{i}')(x)
            x = nn.relu(x)
        return x.max(axis=2)                                 # (B, N, C')


class DGCNNBackbone(nn.Module):
    """GF stack + FA aggregation (reference dgcnn.py defaults: three
    edge convs at k=20, D-KNN first then F-KNN, FA to 1024)."""
    in_channels: int = 6
    num_samples: Tuple[int, ...] = (20, 20, 20)
    knn_modes: Tuple[str, ...] = ('D-KNN', 'F-KNN', 'F-KNN')
    gf_channels: Tuple[Tuple[int, ...], ...] = ((64, 64), (64, 64), (64,))
    fa_channels: Tuple[int, ...] = (1024,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points (B, N, in_channels) -> dict with
        gf_points (list, per-module outputs incl. the input) and
        fa_points (B, N, fa_channels[-1] + sum(gf out channels))."""
        gf_points = [points]
        x = points
        for i in range(len(self.gf_channels)):
            x = EdgeConv(self.gf_channels[i], k=self.num_samples[i],
                         knn_mode=self.knn_modes[i], dtype=self.dtype,
                         name=f'gf{i}')(x, train)
            gf_points.append(x)

        # FA module (dgcnn_fa_module.py:43-68): concat GF outputs,
        # shared MLP, global max appended to the pre-MLP concat.
        cat = jnp.concatenate(gf_points[1:], axis=-1)
        y = cat
        for i, ch in enumerate(self.fa_channels):
            y = nn.Dense(ch, use_bias=False, dtype=self.dtype,
                         name=f'fa_mlp{i}')(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f'fa_bn{i}')(y)
            y = nn.relu(y)
        g = jnp.broadcast_to(y.max(axis=1, keepdims=True), y.shape)
        fa_points = jnp.concatenate([g, cat], axis=-1)
        return {'gf_points': gf_points, 'fa_points': fa_points}
