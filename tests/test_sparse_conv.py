"""Sparse conv ops vs masked dense convolutions (ops/sparse_conv.py).

SubMConv: dense conv of the sparsified volume, evaluated at active
sites only. SparseConv (strided): dense strided conv evaluated at
every output site whose kernel window overlaps an input voxel.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dfm_tpu.ops.sparse_conv import (flatten_key, neighbor_table,
                                     sparse_conv_downsample,
                                     sparse_to_dense,
                                     sparse_voxelize_mean, subm_conv,
                                     unflatten_key)

GRID = (6, 8, 10)
C, CO = 5, 7


def _active_set(rng, n=40, capacity=64):
    nz, ny, nx = GRID
    # random distinct sites
    flat = rng.choice(nz * ny * nx, size=n, replace=False).astype(np.int32)
    keys = np.full(capacity, np.iinfo(np.int32).max, np.int32)
    keys[:n] = np.sort(flat)
    vmask = np.arange(capacity) < n
    feats = rng.randn(capacity, C).astype(np.float32)
    feats[~vmask] = 0.0
    return jnp.asarray(keys), jnp.asarray(vmask), jnp.asarray(feats)


def _dense_from_sparse(keys, vmask, feats):
    return np.asarray(sparse_to_dense(keys, vmask, feats, GRID))


def _dense_conv(x, w, stride=(1, 1, 1), padding=1):
    # w: (K, C, CO) tap-major -> (3,3,3,C,CO)
    k = np.asarray(w).reshape(3, 3, 3, C, CO)
    return jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], jnp.asarray(k), stride,
        [(padding, padding)] * 3,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))[0]


def test_subm_conv_matches_masked_dense():
    rng = np.random.RandomState(0)
    keys, vmask, feats = _active_set(rng)
    w = jnp.asarray(rng.randn(27, C, CO).astype(np.float32) * 0.2)

    nbr = neighbor_table(keys, vmask, GRID)
    out = subm_conv(feats, nbr, w)

    dense = _dense_conv(_dense_from_sparse(keys, vmask, feats), w)
    z, y, x = unflatten_key(keys, GRID)
    want = np.asarray(dense)[np.clip(z, 0, GRID[0] - 1),
                             np.clip(y, 0, GRID[1] - 1),
                             np.clip(x, 0, GRID[2] - 1)]
    got = np.asarray(out)
    np.testing.assert_allclose(got[np.asarray(vmask)],
                               want[np.asarray(vmask)], atol=1e-4)


def test_strided_sparse_conv_matches_dense():
    rng = np.random.RandomState(1)
    keys, vmask, feats = _active_set(rng)
    w = jnp.asarray(rng.randn(27, C, CO).astype(np.float32) * 0.2)

    for stride, pad in (((2, 2, 2), (1, 1, 1)), ((2, 1, 1), (0, 1, 1))):
        ok, om, og, gat = sparse_conv_downsample(
            keys, vmask, GRID, stride, pad, capacity=1024)
        out = subm_conv(feats, gat, w)

        x_d = _dense_from_sparse(keys, vmask, feats)
        k = np.asarray(w).reshape(3, 3, 3, C, CO)
        dense = jax.lax.conv_general_dilated(
            jnp.asarray(x_d)[None], jnp.asarray(k), stride,
            [(pad[0], pad[0]), (pad[1], pad[1]), (pad[2], pad[2])],
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))[0]
        z, y, x = unflatten_key(ok, og)
        m = np.asarray(om)
        got = np.asarray(out)[m]
        want = np.asarray(dense)[np.asarray(z)[m], np.asarray(y)[m],
                                 np.asarray(x)[m]]
        np.testing.assert_allclose(got, want, atol=1e-4, err_msg=str(stride))

        # every output site with a nonzero dense response is active
        resp = np.abs(np.asarray(dense)).sum(-1) > 1e-6
        active = np.zeros(og, bool)
        active[np.asarray(z)[m], np.asarray(y)[m], np.asarray(x)[m]] = True
        # (dense conv can respond at sites the sparse conv doesn't
        # activate ONLY via zero-features voxels — none here)
        occupied_resp = resp & ~active
        assert not occupied_resp.any()


def test_sparse_voxelize_matches_hard_dense():
    rng = np.random.RandomState(2)
    pts = rng.rand(200, 3).astype(np.float32) * [5.0, 4.0, 3.0]
    mask = np.ones(200, bool)
    pcr = jnp.asarray([0, 0, 0, 5, 4, 3], jnp.float32)
    vs = (0.5, 0.5, 0.5)
    grid = (6, 8, 10)
    keys, feats, vmask = sparse_voxelize_mean(
        jnp.asarray(pts), jnp.asarray(mask), pcr, vs, grid,
        capacity=256, max_points=5)
    from dfm_tpu.models.detectors.teacher import voxelize_mean
    dense, cnt = voxelize_mean(jnp.asarray(pts), jnp.asarray(mask), pcr,
                               vs, grid, max_points=5)
    d2 = np.asarray(sparse_to_dense(keys, vmask, feats, grid))
    np.testing.assert_allclose(d2, np.asarray(dense), atol=1e-5)
    assert int(np.asarray(vmask).sum()) == int((np.asarray(cnt) > 0).sum())
