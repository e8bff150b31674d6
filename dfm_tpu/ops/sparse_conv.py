"""Static-capacity submanifold / strided sparse 3D convolutions.

TPU-native equivalent of the reference's spconv stack
(mmdet3d/ops/spconv, used by `CustomSparseEncoder`,
middle_encoders/sparse_encoder.py:218): the 0.05 m LiDAR teacher grid
(41 x 1216 x 1152 = 57M sites) is far too large to densify, but only
~2e4 voxels are occupied. Instead of spconv's dynamic index structures
(rulebooks built on CPU/CUDA per batch), everything here is fixed
shape:

* the active set is a CAPACITY-padded, sorted array of flat voxel
  keys + a validity mask — one (V,) int32 array per level;
* neighbor lookup is vectorized binary search (jnp.searchsorted) of
  `key + offset` in the sorted keys — no hash tables, no host work;
* a submanifold conv is 27 x [row gather (V, C) -> matmul (C, C')] —
  gathers from a <=10 MB table ride the fast small-table gather path,
  matmuls ride the MXU;
* a strided conv enumerates each input's <=8 candidate outputs,
  unique-compacts them (sort + segment ranks, still fixed shape), and
  then runs the same lookup/gather/matmul with the stride-adjusted
  offset map.

Semantics match spconv: SubMConv3d preserves the active set and sees
zeros at inactive neighbors; SparseConv3d activates every site whose
kernel window overlaps an input voxel. Exactness is tested against
masked dense convolutions (tests/test_sparse_conv.py).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['sparse_voxelize_mean', 'neighbor_table', 'subm_conv',
           'inverse_table',
           'sparse_conv_downsample', 'sparse_to_dense', 'unflatten_key',
           'flatten_key']

INVALID = jnp.int32(2147483647)   # sort-to-end sentinel for dead slots


def flatten_key(z, y, x, grid):
    nz, ny, nx = grid
    return (z * ny + y) * nx + x


def unflatten_key(key, grid):
    nz, ny, nx = grid
    x = key % nx
    y = (key // nx) % ny
    z = key // (nx * ny)
    return z, y, x


def _unique_compact(keys, valid, capacity):
    """Sorted unique keys with validity, fixed capacity.

    Args:
        keys: (N,) int32 candidate keys (may repeat).
        valid: (N,) bool.
        capacity: static output size (must be >= #unique; overflow
            drops the largest keys — callers size V >= N to avoid it).

    Returns:
        ukeys (capacity,) sorted (INVALID padded), umask (capacity,),
        slot_of (N,) — output slot of each input candidate (or -1).
    """
    n = keys.shape[0]
    k = jnp.where(valid, keys, INVALID)
    order = jnp.argsort(k)
    ks = k[order]
    first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    first = first & (ks != INVALID)
    slot_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1   # (N,)
    nuniq = slot_sorted[-1] + 1
    ukeys = jnp.full((capacity,), INVALID, jnp.int32)
    ukeys = ukeys.at[jnp.where(first, slot_sorted, capacity)].set(
        ks, mode='drop')
    umask = jnp.arange(capacity) < nuniq
    slot_of = jnp.full((n,), -1, jnp.int32).at[order].set(
        jnp.where(ks != INVALID, slot_sorted, -1))
    return ukeys, umask, slot_of


def sparse_voxelize_mean(points, point_mask, pcr, voxel_size, grid,
                         capacity, max_points=5):
    """Hard voxelization -> sparse mean features.

    Mirrors `Voxelization(max_num_points, max_voxels)` + HardSimpleVFE
    (reference teacher config dfm_r34...py:15-21). Returns
    (keys (V,) sorted flat ids, feats (V, C), vmask (V,)).
    """
    nz, ny, nx = grid
    ix = jnp.floor((points[:, 0] - pcr[0]) / voxel_size[0]).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - pcr[1]) / voxel_size[1]).astype(jnp.int32)
    iz = jnp.floor((points[:, 2] - pcr[2]) / voxel_size[2]).astype(jnp.int32)
    inside = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny) &
              (iz >= 0) & (iz < nz) & point_mask)
    key = flatten_key(iz, iy, ix, grid)

    keys, vmask, slot_of = _unique_compact(key, inside, capacity)

    # arrival-order rank within voxel for the max_points cap
    p = points.shape[0]
    order = jnp.argsort(jnp.where(inside, key, INVALID), stable=True)
    sk = jnp.where(inside, key, INVALID)[order]
    pos = jnp.arange(p)
    is_start = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    seg_start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(is_start, pos, 0))
    rank = jnp.zeros((p,), jnp.int32).at[order].set(
        (pos - seg_start).astype(jnp.int32))
    keep = inside & (rank < max_points) & (slot_of >= 0)

    c = points.shape[-1]
    tgt = jnp.where(keep, slot_of, capacity)
    sums = jax.ops.segment_sum(jnp.where(keep[:, None], points, 0.0),
                               tgt, num_segments=capacity + 1)[:-1]
    cnts = jax.ops.segment_sum(keep.astype(jnp.float32), tgt,
                               num_segments=capacity + 1)[:-1]
    feats = sums / jnp.maximum(cnts[:, None], 1.0)
    return keys, feats.astype(jnp.float32), vmask


def _offsets(kernel=(3, 3, 3)):
    kz, ky, kx = kernel
    return np.array([(dz - kz // 2, dy - ky // 2, dx - kx // 2)
                     for dz in range(kz) for dy in range(ky)
                     for dx in range(kx)], np.int32)


def neighbor_table(keys, vmask, grid, kernel=(3, 3, 3)):
    """(K, V) slot index of each active site's k^3 neighbors (-1 if
    absent). Shared by every SubM conv on the same active set (the
    reference's `indice_key` reuse)."""
    z, y, x = unflatten_key(keys, grid)
    offs = _offsets(kernel)
    nz, ny, nx = grid
    tables = []
    for dz, dy, dx in offs:
        zz, yy, xx = z + dz, y + dy, x + dx
        ok = ((zz >= 0) & (zz < nz) & (yy >= 0) & (yy < ny) &
              (xx >= 0) & (xx < nx) & vmask)
        q = jnp.where(ok, flatten_key(zz, yy, xx, grid), INVALID)
        slot = jnp.searchsorted(keys, q)
        slot = jnp.clip(slot, 0, keys.shape[0] - 1)
        hit = ok & (keys[slot] == q) & vmask[slot]
        tables.append(jnp.where(hit, slot, -1))
    return jnp.stack(tables)                       # (K, V)


def subm_conv(feats, nbr, kernel_w):
    """Submanifold conv: out[v] = sum_k W_k . feats[nbr[k, v]].

    Args:
        feats: (V, C) active-site features (dead slots must be 0).
        nbr: (K, V) from `neighbor_table`.
        kernel_w: (K, C, C') tap-major weights (torch (C',C,kz,ky,kx)
            reshapes to this with k = z-major tap order).
    """
    v = feats.shape[0]
    vo = nbr.shape[1]          # output slots (== v for SubM convs)
    out = jnp.zeros((vo, kernel_w.shape[-1]), jnp.float32)
    fz = jnp.concatenate([feats, jnp.zeros_like(feats[:1])], axis=0)
    for k in range(nbr.shape[0]):
        idx = jnp.where(nbr[k] >= 0, nbr[k], v)
        g = fz[idx]
        out = out + jnp.matmul(g, kernel_w[k],
                               preferred_element_type=jnp.float32)
    return out.astype(feats.dtype)


def sparse_conv_downsample(keys, vmask, grid, stride, padding,
                           capacity, kernel=(3, 3, 3)):
    """Active-set map of a strided SparseConv3d.

    Returns (out_keys (Vo,), out_mask, out_grid, gather (K, Vo)):
    gather[k, o] = input slot feeding output o through kernel tap k
    (-1 when absent). Output site o covers inputs at
    o*stride - padding + tap.
    """
    sz, sy, sx = stride
    pz, py, px = padding
    kz, ky, kx = kernel
    nz, ny, nx = grid
    og = ((nz + 2 * pz - kz) // sz + 1,
          (ny + 2 * py - ky) // sy + 1,
          (nx + 2 * px - kx) // sx + 1)

    z, y, x = unflatten_key(keys, grid)

    def out_range(i, p, s, k, n_out):
        lo = jnp.maximum((i + p - k + s) // s, 0)       # ceil((i+p-k+1)/s)
        hi = jnp.minimum((i + p) // s, n_out - 1)
        return lo, hi

    zlo, zhi = out_range(z, pz, sz, kz, og[0])
    ylo, yhi = out_range(y, py, sy, ky, og[1])
    xlo, xhi = out_range(x, px, sx, kx, og[2])

    # candidate outputs per input: (k-1)//s + 1 per dim
    az_n = (kz - 1) // sz + 1
    ay_n = (ky - 1) // sy + 1
    ax_n = (kx - 1) // sx + 1
    cand = []
    cvalid = []
    for az in range(az_n):
        for ay in range(ay_n):
            for ax in range(ax_n):
                oz = jnp.minimum(zlo + az, zhi)
                oy = jnp.minimum(ylo + ay, yhi)
                ox = jnp.minimum(xlo + ax, xhi)
                ok = vmask & (zlo <= zhi) & (ylo <= yhi) & (xlo <= xhi)
                cand.append(flatten_key(oz, oy, ox, og))
                cvalid.append(ok)
    cand = jnp.concatenate(cand)
    cvalid = jnp.concatenate(cvalid)
    out_keys, out_mask, _ = _unique_compact(cand, cvalid, capacity)

    # reverse map: for each output site and tap, find the input slot
    zo, yo, xo = unflatten_key(out_keys, og)
    tables = []
    for dz, dy, dx in _offsets(kernel):
        iz = zo * sz - pz + (dz + kz // 2)
        iy = yo * sy - py + (dy + ky // 2)
        ix = xo * sx - px + (dx + kx // 2)
        ok = ((iz >= 0) & (iz < nz) & (iy >= 0) & (iy < ny) &
              (ix >= 0) & (ix < nx) & out_mask)
        q = jnp.where(ok, flatten_key(iz, iy, ix, grid), INVALID)
        slot = jnp.clip(jnp.searchsorted(keys, q), 0, keys.shape[0] - 1)
        hit = ok & (keys[slot] == q) & vmask[slot]
        tables.append(jnp.where(hit, slot, -1))
    return out_keys, out_mask, og, jnp.stack(tables)


def inverse_table(fine_keys, fine_mask, coarse_keys, coarse_mask,
                  fine_grid, coarse_grid, stride, padding,
                  kernel=(3, 3, 3)):
    """Gather table of a SparseInverseConv3d (U-Net decoder step).

    The inverse conv scatters each coarse site o back over the fine
    sites i = o*stride - padding + tap; equivalently fine site i
    GATHERS from o = (i + padding - tap) / stride when divisible.
    Returns (K, Vf) slot table into `coarse_keys` (-1 = absent), ready
    for `subm_conv(coarse_feats, table, w)` evaluated at the fine set.
    """
    sz, sy, sx = stride
    pz, py, px = padding
    kz, ky, kx = kernel
    z, y, x = unflatten_key(fine_keys, fine_grid)
    ngz, ngy, ngx = coarse_grid
    tables = []
    for dz, dy, dx in _offsets(kernel):
        tz = z + pz - (dz + kz // 2)
        ty = y + py - (dy + ky // 2)
        tx = x + px - (dx + kx // 2)
        ok = ((tz % sz == 0) & (ty % sy == 0) & (tx % sx == 0) &
              fine_mask)
        oz, oy, ox = tz // sz, ty // sy, tx // sx
        ok = ok & (oz >= 0) & (oz < ngz) & (oy >= 0) & (oy < ngy) & \
            (ox >= 0) & (ox < ngx)
        q = jnp.where(ok, flatten_key(oz, oy, ox, coarse_grid), INVALID)
        slot = jnp.clip(jnp.searchsorted(coarse_keys, q), 0,
                        coarse_keys.shape[0] - 1)
        hit = ok & (coarse_keys[slot] == q) & coarse_mask[slot]
        tables.append(jnp.where(hit, slot, -1))
    return jnp.stack(tables)


def sparse_to_dense(keys, vmask, feats, grid):
    """Scatter active features onto the dense (Nz, Ny, Nx, C) grid."""
    nz, ny, nx = grid
    c = feats.shape[-1]
    tgt = jnp.where(vmask, keys, nz * ny * nx)
    dense = jnp.zeros((nz * ny * nx + 1, c), feats.dtype)
    dense = dense.at[tgt].set(jnp.where(vmask[:, None], feats, 0.0))
    return dense[:-1].reshape(nz, ny, nx, c)
