"""PointNet++ multi-scale-grouping backbone (flax, static shapes).

Equivalent of the reference's `PointNet2SAMSG`
(mmdet3d/models/backbones/pointnet2_sa_msg.py:13-175 + mmcv's
Points_Sampler / PointSAModuleMSG): per stage, a configurable fusion of
D-FPS (xyz-space FPS), F-FPS (FPS in [xyz, feature] space) and 'FS'
(both, concatenated) selects the centers — 3DSSD's fusion sampling —
then multi-radius dilated ball queries group neighbors, per-radius
shared MLPs + max-pool extract features, and an aggregation MLP mixes
the scales (reference pointnet2_sa_msg.py:113-124).

TPU-first: FPS runs as a vmapped `lax.fori_loop` over distance minima
(no CUDA op), ball query is a static top-k, and every parameterized
layer (Dense + BatchNorm) sees the full (B, M, K, C) batch — batch
statistics reduce over the real batch axis.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .pointnet2 import (ball_group, batched_ball_group,
                        farthest_point_sample)

__all__ = ['sample_centers', 'SAModuleMSG', 'PointNet2SAMSG']


def _fps_feature(xyz, feats, npoint):
    """F-FPS: FPS in the concatenated [xyz, feats] metric (mmcv
    Points_Sampler FFPS semantics)."""
    space = jnp.concatenate([xyz, feats], axis=-1) if feats is not None \
        else xyz
    return farthest_point_sample(space, npoint)


def sample_centers(xyz, feats, fps_mods, fps_ranges, npoints):
    """Fusion sampling for one sample.

    Args:
        xyz: (N, 3); feats: (N, C) or None.
        fps_mods: tuple of 'D-FPS' | 'F-FPS' | 'FS'.
        fps_ranges: per-mod slice end (exclusive; -1 = to the end);
            mod i samples from xyz[prev_end:end].
        npoints: per-mod sample count ('FS' emits 2x: F-FPS + D-FPS).

    Returns (M,) int32 indices into xyz (M = static total).
    """
    n = xyz.shape[0]
    out = []
    start = 0
    for mod, rng_end, npoint in zip(fps_mods, fps_ranges, npoints):
        end = n if rng_end == -1 else min(rng_end, n)
        sub_xyz = xyz[start:end]
        sub_feats = None if feats is None else feats[start:end]
        if mod == 'D-FPS':
            idx = farthest_point_sample(sub_xyz, npoint)
            out.append(idx + start)
        elif mod == 'F-FPS':
            idx = _fps_feature(sub_xyz, sub_feats, npoint)
            out.append(idx + start)
        elif mod == 'FS':
            fi = _fps_feature(sub_xyz, sub_feats, npoint)
            di = farthest_point_sample(sub_xyz, npoint)
            out.append(fi + start)
            out.append(di + start)
        else:
            raise ValueError(f'unknown fps mod {mod!r}')
        start = end
    return jnp.concatenate(out).astype(jnp.int32)


class SAModuleMSG(nn.Module):
    """Multi-scale set abstraction (reference PointSAModuleMSG):
    fusion-sampled centers, per-radius dilated ball groups + MLPs,
    max-pool, concat over radii, optional aggregation 1x1 MLP."""
    npoints: Tuple[int, ...]          # per-fps-mod counts
    radii: Tuple[float, ...]
    ks: Tuple[int, ...]
    mlps: Tuple[Tuple[int, ...], ...]
    fps_mods: Tuple[str, ...] = ('D-FPS',)
    fps_ranges: Tuple[int, ...] = (-1,)
    dilated: bool = True
    aggregation: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, feats, train: bool = False,
                 target_idx=None, target_xyz=None):
        """xyz (B, N, 3), feats (B, N, C)|None ->
        (new_xyz (B, M, 3), new_feats (B, M, C'), idx (B, M)).

        target_xyz: external group centers (B, M, 3) — the reference's
        `target_xyz` path (point_sa_module.py:112-145), used by vote
        aggregation; sampling is skipped and idx is zeros.
        """
        if target_xyz is not None:
            idx = jnp.zeros(target_xyz.shape[:2], jnp.int32)
            new_xyz = target_xyz
        elif target_idx is None:
            idx = jax.vmap(lambda x, f: sample_centers(
                x, f, self.fps_mods, self.fps_ranges, self.npoints))(
                    xyz, feats) if feats is not None else \
                jax.vmap(lambda x: sample_centers(
                    x, None, self.fps_mods, self.fps_ranges,
                    self.npoints))(xyz)
        else:
            idx = target_idx
        if target_xyz is None:
            new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)

        scale_feats = []
        for i, (radius, k) in enumerate(zip(self.radii, self.ks)):
            min_r = self.radii[i - 1] if (self.dilated and i > 0) else 0.0
            g = batched_ball_group(xyz, feats, new_xyz, radius, k,
                                   min_radius=min_r)
            x = g.astype(self.dtype)
            for j, ch in enumerate(self.mlps[i]):
                x = nn.Dense(ch, dtype=self.dtype,
                             name=f'mlp{i}_{j}')(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, dtype=self.dtype,
                                 name=f'bn{i}_{j}')(x)
                x = nn.relu(x)
            scale_feats.append(x.max(axis=2))         # (B, M, C_i)
        out = jnp.concatenate(scale_feats, axis=-1)
        if self.aggregation is not None:
            out = nn.Dense(self.aggregation, dtype=self.dtype,
                           name='aggregation')(out)
            out = nn.BatchNorm(use_running_average=not train,
                               momentum=0.9, dtype=self.dtype,
                               name='aggregation_bn')(out)
            out = nn.relu(out)
        return new_xyz, out, idx


class PointNet2SAMSG(nn.Module):
    """3-stage MSG stack with 3DSSD's fusion-sampling defaults
    (reference configs/_base_/models/3dssd.py:3-20)."""
    num_points: Tuple[Tuple[int, ...], ...] = ((4096,), (512,),
                                               (256, 256))
    radii: Tuple[Tuple[float, ...], ...] = (
        (0.2, 0.4, 0.8), (0.4, 0.8, 1.6), (1.6, 3.2, 4.8))
    num_samples: Tuple[Tuple[int, ...], ...] = (
        (32, 32, 64), (32, 32, 64), (32, 32, 32))
    sa_channels: Tuple[Tuple[Tuple[int, ...], ...], ...] = (
        ((16, 16, 32), (16, 16, 32), (32, 32, 64)),
        ((64, 64, 128), (64, 64, 128), (64, 96, 128)),
        ((128, 128, 256), (128, 192, 256), (128, 256, 256)))
    aggregation_channels: Tuple[int, ...] = (64, 128, 256)
    fps_mods: Tuple[Tuple[str, ...], ...] = (
        ('D-FPS',), ('FS',), ('F-FPS', 'D-FPS'))
    fps_ranges: Tuple[Tuple[int, ...], ...] = ((-1,), (-1,), (512, -1))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points (B, N, 3+C) -> dict(sa_xyz, sa_features, sa_indices)
        lists per stage (last entry = final seeds), mirroring the
        reference forward (pointnet2_sa_msg.py:127-175)."""
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None
        b, n = xyz.shape[:2]
        indices = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None], (b, n))
        sa_xyz, sa_feats, sa_idx = [xyz], [feats], [indices]
        for s in range(len(self.num_points)):
            xyz, feats, idx = SAModuleMSG(
                npoints=tuple(self.num_points[s]),
                radii=tuple(self.radii[s]),
                ks=tuple(self.num_samples[s]),
                mlps=tuple(tuple(m) for m in self.sa_channels[s]),
                fps_mods=tuple(self.fps_mods[s]),
                fps_ranges=tuple(self.fps_ranges[s]),
                aggregation=self.aggregation_channels[s],
                dtype=self.dtype, name=f'sa{s}')(xyz, feats, train)
            sa_xyz.append(xyz)
            sa_feats.append(feats)
            sa_idx.append(jnp.take_along_axis(sa_idx[-1], idx, axis=1))
        return dict(sa_xyz=sa_xyz, sa_features=sa_feats,
                    sa_indices=sa_idx)
