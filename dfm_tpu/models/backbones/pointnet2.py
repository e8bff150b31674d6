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

__all__ = ['farthest_point_sample', 'ball_group', 'batched_fps',
           'batched_ball_group', 'three_interpolate', 'SAModule',
           'FPModule', 'PointNet2SASSG']


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


def ball_group(xyz, feats, centers_xyz, radius, k, min_radius=0.0):
    """Group up to `k` in-radius neighbors per center (reference
    ball_query + QueryAndGroup): returns (M, K, 3 + C) with relative
    coordinates; out-of-radius slots repeat the nearest point.
    min_radius > 0 gives the dilated ball query used by 3DSSD's MSG
    stages (reference point_sa_module.py:96-106)."""
    d2 = jnp.sum((centers_xyz[:, None, :] - xyz[None, :, :])**2, -1)
    in_ball = d2 <= radius**2
    if min_radius > 0:
        in_ball &= d2 >= min_radius**2
    masked = jnp.where(in_ball, d2, jnp.inf)
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


def batched_fps(xyz, npoint):
    """(B, N, 3) -> (B, npoint) indices (vmapped FPS)."""
    return jax.vmap(lambda x: farthest_point_sample(x, npoint))(xyz)


def batched_ball_group(xyz, feats, centers_xyz, radius, k,
                       min_radius=0.0):
    """(B, N, 3), (B, N, C)|None, (B, M, 3) -> (B, M, K, 3 + C)."""
    if feats is None:
        return jax.vmap(
            lambda x, c: ball_group(x, None, c, radius, k,
                                    min_radius))(xyz, centers_xyz)
    return jax.vmap(
        lambda x, f, c: ball_group(x, f, c, radius, k,
                                   min_radius))(xyz, feats, centers_xyz)


class SAModule(nn.Module):
    """Single-scale set abstraction: FPS -> ball group -> shared MLP ->
    max-pool. Batched: the geometry ops (FPS / ball query) are vmapped
    pure functions; the MLP + BatchNorm run on the full (B, M, K, C)
    tensor so batch statistics reduce over the real batch (the
    reference's BN2d over (B, C, npoint, K))."""
    npoint: int
    radius: float
    k: int
    mlp: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, feats, train: bool = False):
        """xyz (B, N, 3), feats (B, N, C) or None ->
        (new_xyz (B, M, 3), pooled (B, M, C'))."""
        idx = batched_fps(xyz, self.npoint)
        new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)
        g = batched_ball_group(xyz, feats, new_xyz, self.radius, self.k)
        x = g.astype(self.dtype)
        for i, ch in enumerate(self.mlp):
            x = nn.Dense(ch, dtype=self.dtype, name=f'mlp{i}')(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, dtype=self.dtype,
                             name=f'bn{i}')(x)
            x = nn.relu(x)
        return new_xyz, x.max(axis=2)           # (B, M, 3), (B, M, C)


def three_interpolate(src_xyz, src_feats, dst_xyz, eps=1e-8):
    """Inverse-distance 3-NN feature interpolation (reference mmcv
    three_nn + three_interpolate, used by PointFPModule).

    src_xyz (B, S, 3) + src_feats (B, S, C) -> features at
    dst_xyz (B, N, 3): (B, N, C).
    """
    d2 = jnp.sum(
        (dst_xyz[:, :, None, :] - src_xyz[:, None, :, :]) ** 2, -1)
    neg, idx = jax.lax.top_k(-d2, min(3, src_xyz.shape[1]))  # (B, N, 3)
    w = 1.0 / (-neg + eps)
    w = w / w.sum(-1, keepdims=True)
    gathered = jnp.take_along_axis(
        src_feats[:, None], idx[..., None], axis=2)      # (B, N, 3, C)
    return (gathered * w[..., None]).sum(axis=2)


class FPModule(nn.Module):
    """Feature propagation: interpolate coarse features onto a finer
    point set, concat with its skip features, shared MLP (reference
    mmdet3d/ops/pointnet_modules/point_fp_module.py)."""
    mlp: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, dst_xyz, dst_feats, src_xyz, src_feats,
                 train: bool = False):
        interp = three_interpolate(src_xyz, src_feats, dst_xyz)
        x = interp if dst_feats is None else \
            jnp.concatenate([dst_feats, interp], axis=-1)
        x = x.astype(self.dtype)
        for i, ch in enumerate(self.mlp):
            x = nn.Dense(ch, dtype=self.dtype, name=f'mlp{i}')(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, dtype=self.dtype,
                             name=f'bn{i}')(x)
            x = nn.relu(x)
        return x


class PointNet2SASSG(nn.Module):
    """SSG stack (VoteNet defaults: 4 SA levels) + optional FP decoder
    (GroupFree3D / PointRCNN: fp_channels interpolate back up the SA
    pyramid; reference pointnet2_sa_ssg.py fp_channels)."""
    sa_points: Tuple[int, ...] = (2048, 1024, 512, 256)
    sa_radii: Tuple[float, ...] = (0.2, 0.4, 0.8, 1.2)
    sa_ks: Tuple[int, ...] = (64, 32, 16, 16)
    sa_mlps: Tuple[Tuple[int, ...], ...] = (
        (64, 64, 128), (128, 128, 256), (128, 128, 256),
        (128, 128, 256))
    fp_channels: Tuple[Tuple[int, ...], ...] = ()
    # segmentation decode heads need the whole SA pyramid (reference
    # backbones return dict(sa_xyz, sa_features, sa_indices))
    return_hierarchy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points (B, N, 3+C) -> (seed_xyz (B, M, 3),
        seed_feats (B, M, C')). With fp_channels, seeds are the FP
        level len(fp_channels) steps up from the coarsest SA. With
        return_hierarchy, dict(sa_xyz=[...], sa_features=[...]) with
        level 0 = the raw input points."""
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None
        sa_xyz, sa_feats = [xyz], [feats]
        for i in range(len(self.sa_points)):
            xyz, feats = SAModule(
                self.sa_points[i], self.sa_radii[i], self.sa_ks[i],
                self.sa_mlps[i], dtype=self.dtype,
                name=f'sa{i}')(xyz, feats, train)
            sa_xyz.append(xyz)
            sa_feats.append(feats)
        if self.return_hierarchy:
            assert not self.fp_channels
            return dict(sa_xyz=sa_xyz, sa_features=sa_feats)
        for j, mlp in enumerate(self.fp_channels):
            dst = len(sa_xyz) - 2 - j
            feats = FPModule(mlp, dtype=self.dtype, name=f'fp{j}')(
                sa_xyz[dst], sa_feats[dst], xyz, feats, train)
            xyz = sa_xyz[dst]
        return xyz, feats
