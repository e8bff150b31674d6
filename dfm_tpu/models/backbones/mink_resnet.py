"""Minkowski-style sparse ResNet backbone (flax, static capacity).

Equivalent of the reference's `MinkResNet`
(mmdet3d/models/backbones/mink_resnet.py:20-116, MinkowskiEngine
BasicBlock stages): stem conv (stride 2) + instance norm + optional
max pool, then `num_stages` BasicBlock stages each opening with a
stride-2 convolution and a 1x1 strided identity projection.

TPU-native: instead of MinkowskiEngine's dynamic coordinate maps,
every level is a CAPACITY-padded sorted key array + validity mask
(dfm_tpu.ops.sparse_conv). Minkowski stride-2 semantics — the output
coordinate set is `unique(coords // 2)`, NOT spconv's window cover —
are reproduced by `mink_downsample` below; stride-1 convolutions
evaluate on the input active set (submanifold gather/matmul). Norms
use masked statistics over valid slots (SparseBN / per-sample
instance norm), so dead padding slots never leak into the moments.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

import numpy as np

from ...ops.sparse_conv import (INVALID, _unique_compact, flatten_key,
                                neighbor_table, subm_conv, unflatten_key)
from ..detectors.teacher import SparseBN

__all__ = ['MinkResNet', 'mink_downsample', 'mink_out_grid']


def mink_out_grid(grid, stride=2):
    return tuple((int(d) + stride - 1) // stride for d in grid)


def _mink_offsets(kernel):
    """MinkowskiEngine tap offsets: odd kernel dims are centered
    ({-k//2..k//2}); EVEN dims are forward ({0..k-1}), so a k=2 s=2
    pool window over output coord o covers inputs {2o, 2o+1} — the
    same voxels whose `coords // 2` equals o."""
    rs = [range(k) if k % 2 == 0 else range(-(k // 2), k // 2 + 1)
          for k in kernel]
    return np.array([(dz, dy, dx) for dz in rs[0] for dy in rs[1]
                     for dx in rs[2]], np.int32)


def mink_downsample(keys, vmask, grid, stride=2, kernel=(3, 3, 3)):
    """Minkowski stride-s coordinate map + gather tables (single
    sample; vmap over batch).

    Output active set is `unique(coords // s)` (MinkowskiEngine
    convention); gather[k, o] is the input slot at
    `out_coord * s + tap_offset` (-1 when inactive). Output capacity
    equals the input capacity (|out| <= |in| always holds here).

    Returns (out_keys, out_mask, gather (K, Vo)); the static output
    grid is `mink_out_grid(grid, stride)`.
    """
    nz, ny, nx = grid
    og = mink_out_grid(grid, stride)
    z, y, x = unflatten_key(keys, grid)
    cand = flatten_key(z // stride, y // stride, x // stride, og)
    out_keys, out_mask, _ = _unique_compact(
        jnp.where(vmask, cand, INVALID), vmask, keys.shape[0])

    zo, yo, xo = unflatten_key(out_keys, og)
    tables = []
    for dz, dy, dx in _mink_offsets(kernel):
        iz = zo * stride + dz
        iy = yo * stride + dy
        ix = xo * stride + dx
        ok = ((iz >= 0) & (iz < nz) & (iy >= 0) & (iy < ny) &
              (ix >= 0) & (ix < nx) & out_mask)
        q = jnp.where(ok, flatten_key(iz, iy, ix, grid), INVALID)
        slot = jnp.clip(jnp.searchsorted(keys, q), 0, keys.shape[0] - 1)
        hit = ok & (keys[slot] == q) & vmask[slot]
        tables.append(jnp.where(hit, slot, -1))
    return out_keys, out_mask, jnp.stack(tables)


class _SpConv(nn.Module):
    """Weight holder: (K, Cin, Cout) tap-major sparse conv kernel."""
    taps: int
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        return self.param('kernel', nn.initializers.lecun_normal(),
                          (self.taps, self.cin, self.cout), jnp.float32)


def _masked_instance_norm(x, vmask, scale, bias, eps=1e-5):
    """Per-sample, per-channel norm over valid slots
    (MinkowskiInstanceNorm semantics on the active set).
    x (B, V, C); vmask (B, V)."""
    m = vmask[..., None].astype(jnp.float32)
    xf = x.astype(jnp.float32) * m
    cnt = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
    mean = xf.sum(axis=1, keepdims=True) / cnt
    var = (xf * xf).sum(axis=1, keepdims=True) / cnt - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return (y * m).astype(x.dtype)


class MinkResNet(nn.Module):
    """depth in {18, 34}: BasicBlock stages (2,2,2,2) / (3,4,6,3).

    Call: (keys (B, V) sorted flat voxel ids, feats (B, V, Cin),
    vmask (B, V), grid (Nz, Ny, Nx) static) -> list of per-stage
    (keys, mask, grid, feats) sparse tensors, coarsest last.
    """
    depth: int = 18
    in_channels: int = 3
    num_stages: int = 4
    pool: bool = True
    base_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, keys, feats, vmask, grid, train: bool = False):
        arch = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}
        assert self.depth in arch, f'invalid depth {self.depth}'
        assert 1 <= self.num_stages <= 4
        blocks = arch[self.depth][:self.num_stages]
        grid = tuple(int(d) for d in grid)

        def vconv(x, gather, w):
            return jax.vmap(subm_conv, in_axes=(0, 0, None))(
                x, gather, w.astype(self.dtype))

        def vdown(keys_l, mask_l, grid_l, kernel=(3, 3, 3)):
            ok, om, gat = jax.vmap(
                lambda k, m: mink_downsample(k, m, grid_l,
                                             kernel=kernel))(keys_l, mask_l)
            return ok, om, mink_out_grid(grid_l), gat

        # --- stem: stride-2 conv, instance norm, relu, optional pool
        ok, om, g1, gat = vdown(keys, vmask, grid)
        w1 = _SpConv(27, self.in_channels, self.base_channels,
                     name='conv1')()
        x = vconv(feats.astype(self.dtype) *
                  vmask[..., None].astype(self.dtype), gat, w1)
        keys_c, mask_c, grid_c = ok, om, g1
        sc = self.param('norm1_scale', nn.initializers.ones,
                        (self.base_channels,), jnp.float32)
        bi = self.param('norm1_bias', nn.initializers.zeros,
                        (self.base_channels,), jnp.float32)
        x = nn.relu(_masked_instance_norm(x, mask_c, sc, bi))

        if self.pool:   # MinkowskiMaxPooling k2 s2
            ok, om, g2, gat = vdown(keys_c, mask_c, grid_c,
                                    kernel=(2, 2, 2))
            xz = jnp.concatenate(
                [x, jnp.full_like(x[:, :1], -jnp.inf)], axis=1)
            v = x.shape[1]
            pooled = None
            for k in range(gat.shape[1]):
                idx = jnp.where(gat[:, k] >= 0, gat[:, k], v)
                g = jnp.take_along_axis(xz, idx[..., None], axis=1)
                pooled = g if pooled is None else jnp.maximum(pooled, g)
            x = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
            keys_c, mask_c, grid_c = ok, om, g2
        x = x * mask_c[..., None].astype(x.dtype)

        # --- BasicBlock stages
        outs = []
        cin = self.base_channels
        for s, nblocks in enumerate(blocks):
            cout = self.base_channels * 2 ** s
            ok, om, g_next, gat = vdown(keys_c, mask_c, grid_c)
            y = vconv(x, gat, _SpConv(27, cin, cout,
                                      name=f'layer{s}_0_conv1')())
            # 1x1 stride-2 identity projection rides the center tap
            # (offset (0,0,0) == table row 13) of the same coord map
            ident = vconv(x, gat[:, 13:14],
                          _SpConv(1, cin, cout, name=f'layer{s}_0_down')())
            keys_c, mask_c, grid_c = ok, om, g_next
            y = SparseBN(cout, dtype=self.dtype, name=f'layer{s}_0_bn1')(
                y, mask_c, train)
            y = nn.relu(y)
            nbr = jax.vmap(lambda k, m: neighbor_table(k, m, grid_c))(
                keys_c, mask_c)
            y = vconv(y * mask_c[..., None].astype(y.dtype), nbr,
                      _SpConv(27, cout, cout, name=f'layer{s}_0_conv2')())
            y = SparseBN(cout, dtype=self.dtype, name=f'layer{s}_0_bn2')(
                y, mask_c, train)
            ident = SparseBN(cout, dtype=self.dtype, name=f'layer{s}_0_dbn')(
                ident, mask_c, train)
            x = nn.relu(y + ident)
            cin = cout

            for b in range(1, nblocks):
                y = vconv(x * mask_c[..., None].astype(x.dtype), nbr,
                          _SpConv(27, cout, cout,
                                  name=f'layer{s}_{b}_conv1')())
                y = SparseBN(cout, dtype=self.dtype, name=f'layer{s}_{b}_bn1')(
                    y, mask_c, train)
                y = nn.relu(y)
                y = vconv(y * mask_c[..., None].astype(y.dtype), nbr,
                          _SpConv(27, cout, cout,
                                  name=f'layer{s}_{b}_conv2')())
                y = SparseBN(cout, dtype=self.dtype, name=f'layer{s}_{b}_bn2')(
                    y, mask_c, train)
                x = nn.relu(y + x)
            outs.append((keys_c, mask_c, grid_c, x))
        return outs
