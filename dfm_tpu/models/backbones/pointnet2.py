"""PointNet++ set-abstraction backbone (flax, static shapes).

Equivalent of the reference's inherited `PointNet2SASSG`
(mmdet3d/models/backbones/pointnet2_sa_ssg.py + mmcv's CUDA
furthest_point_sample / ball_query / grouping ops): farthest-point
sampling as a `lax.fori_loop` over distance minima, ball-query
grouping as a top-k over masked distances (fixed K neighbors, empty
slots fall back to the center point), and the per-group MLP + max-pool
as batched matmuls — no dynamic point lists anywhere.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ['farthest_point_sample', 'ball_group', 'SAModule',
           'PointNet2SASSG']


def farthest_point_sample(xyz, npoint):
    """(N, 3) -> (npoint,) indices (reference furthest_point_sample)."""
    n = xyz.shape[0]

    def body(i, state):
        dists, idxs, last = state
        d = jnp.sum((xyz - xyz[last])**2, axis=-1)
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        return dists, idxs, nxt

    idxs = jnp.zeros((npoint,), jnp.int32)
    state = (jnp.full((n,), jnp.inf), idxs, jnp.int32(0))
    _, idxs, _ = jax.lax.fori_loop(1, npoint, body, state)
    return idxs


def ball_group(xyz, feats, centers_xyz, radius, k):
    """Group up to `k` in-radius neighbors per center (reference
    ball_query + QueryAndGroup): returns (M, K, 3 + C) with relative
    coordinates; out-of-radius slots repeat the nearest point."""
    d2 = jnp.sum((centers_xyz[:, None, :] - xyz[None, :, :])**2, -1)
    masked = jnp.where(d2 <= radius**2, d2, jnp.inf)
    kk = min(k, xyz.shape[0])
    _, nbr = jax.lax.top_k(-masked, kk)               # (M, kk)
    if kk < k:                      # tiny clouds: repeat the last slot
        nbr = jnp.concatenate(
            [nbr, jnp.repeat(nbr[:, -1:], k - kk, axis=1)], axis=1)
    valid = jnp.take_along_axis(masked, nbr, axis=1) < jnp.inf
    nearest = jnp.argmin(d2, axis=1, keepdims=True)
    nbr = jnp.where(valid, nbr, nearest)
    rel = xyz[nbr] - centers_xyz[:, None, :]
    parts = [rel]
    if feats is not None:
        parts.append(feats[nbr])
    return jnp.concatenate(parts, axis=-1)


class SAModule(nn.Module):
    """Single-scale set abstraction: FPS -> ball group -> shared MLP ->
    max-pool."""
    npoint: int
    radius: float
    k: int
    mlp: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, feats, train: bool = False):
        idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = xyz[idx]
        g = ball_group(xyz, feats, new_xyz, self.radius, self.k)
        x = g.astype(self.dtype)
        for i, ch in enumerate(self.mlp):
            x = nn.Dense(ch, dtype=self.dtype, name=f'mlp{i}')(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, dtype=self.dtype,
                             name=f'bn{i}')(x)
            x = nn.relu(x)
        return new_xyz, x.max(axis=1)                 # (M, 3), (M, C)


class PointNet2SASSG(nn.Module):
    """SSG stack (VoteNet defaults: 4 SA levels)."""
    sa_points: Tuple[int, ...] = (2048, 1024, 512, 256)
    sa_radii: Tuple[float, ...] = (0.2, 0.4, 0.8, 1.2)
    sa_ks: Tuple[int, ...] = (64, 32, 16, 16)
    sa_mlps: Tuple[Tuple[int, ...], ...] = (
        (64, 64, 128), (128, 128, 256), (128, 128, 256),
        (128, 128, 256))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points (N, 3+C) -> (seed_xyz (M, 3), seed_feats (M, C'))."""
        xyz = points[:, :3]
        feats = points[:, 3:] if points.shape[1] > 3 else None
        for i in range(len(self.sa_points)):
            xyz, feats = SAModule(
                self.sa_points[i], self.sa_radii[i], self.sa_ks[i],
                self.sa_mlps[i], dtype=self.dtype,
                name=f'sa{i}')(xyz, feats, train)
        return xyz, feats
