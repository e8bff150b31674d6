"""Ops tests. torch (CPU) is used as an *oracle* for grid_sample/interp
parity — the implementations are independent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dfm_tpu.ops import cost_volume, frustum, grid_sample, resize


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def test_bilinear_sample_matches_torch():
    feat = _rand(7, 9, 3)
    h, w = 7, 9
    coords = np.stack(np.meshgrid(
        np.linspace(-1, w, 13), np.linspace(-1, h, 11),
        indexing='xy'), axis=-1).astype(np.float32)  # includes OOB
    out = np.asarray(grid_sample.bilinear_sample(
        jnp.asarray(feat), jnp.asarray(coords)))

    # torch oracle: normalized align_corners grid
    tfeat = torch.from_numpy(feat).permute(2, 0, 1)[None]
    gx = coords[..., 0] / (w - 1) * 2 - 1
    gy = coords[..., 1] / (h - 1) * 2 - 1
    tgrid = torch.from_numpy(np.stack([gx, gy], -1))[None]
    ref = F.grid_sample(tfeat, tgrid, mode='bilinear', padding_mode='zeros',
                        align_corners=True)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_trilinear_sample_matches_torch():
    vol = _rand(5, 6, 7, 2)
    d, h, w = 5, 6, 7
    rng = np.random.RandomState(1)
    coords = np.stack([
        rng.uniform(-1, w, 200), rng.uniform(-1, h, 200),
        rng.uniform(-1, d, 200)], axis=-1).astype(np.float32)
    out = np.asarray(grid_sample.trilinear_sample(
        jnp.asarray(vol), jnp.asarray(coords)))

    tvol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]
    g = coords.copy()
    g[:, 0] = g[:, 0] / (w - 1) * 2 - 1
    g[:, 1] = g[:, 1] / (h - 1) * 2 - 1
    g[:, 2] = g[:, 2] / (d - 1) * 2 - 1
    tgrid = torch.from_numpy(g)[None, :, None, None, :]
    ref = F.grid_sample(tvol, tgrid, mode='bilinear', padding_mode='zeros',
                        align_corners=True)[0, :, :, 0, 0].T.numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_resize_linear_matches_torch_bilinear():
    x = _rand(1, 8, 12, 3)
    out = np.asarray(resize.resize_linear(
        jnp.asarray(x), (17, 29), axes=(1, 2)))
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(tx, size=(17, 29), mode='bilinear',
                        align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_resize_linear_matches_torch_trilinear():
    x = _rand(1, 4, 6, 8, 2)
    out = np.asarray(resize.resize_linear(
        jnp.asarray(x), (16, 24, 32), axes=(1, 2, 3)))
    tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    ref = F.interpolate(tx, size=(16, 24, 32), mode='trilinear',
                        align_corners=True).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_avg_pool():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    out = np.asarray(resize.avg_pool_2d(x, 2))
    np.testing.assert_allclose(out[0, :, :, 0],
                               [[2.5, 4.5], [10.5, 12.5]], atol=1e-6)


def _kitti_cam2img():
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = m[1, 1] = 721.5
    m[0, 2] = 160.0
    m[1, 2] = 60.0
    return m


def test_plane_sweep_identity_prev():
    """With cur2prev = identity and no aug, cur and prev grids coincide
    and equal the strided pixel grid -> sampled features match the
    strided feature map."""
    h, w, c = 16, 32, 4
    feats = jnp.asarray(_rand(1, h, w, c))
    depths = jnp.asarray(np.linspace(2, 59.6, 6, dtype=np.float32))
    cam2img = jnp.asarray(_kitti_cam2img())[None]
    cur2prev = jnp.eye(4)[None]
    cost = cost_volume.build_plane_sweep_cost(
        feats, feats, depths, cam2img, cur2prev,
        cost_sample_factor=4, feat_sample_factor=1)
    assert cost.shape == (1, 6, 4, 8, 2 * c)
    np.testing.assert_allclose(
        np.asarray(cost[..., :c]), np.asarray(cost[..., c:]), atol=1e-4)
    # depth-independent for identity warp: all depth slices identical
    np.testing.assert_allclose(np.asarray(cost[0, 0]), np.asarray(cost[0, -1]),
                               atol=1e-3)
    # cur sample at (y*4, x*4) equals the feature there
    np.testing.assert_allclose(np.asarray(cost[0, 0, 1, 2, :c]),
                               np.asarray(feats[0, 4, 8]), atol=1e-3)


def test_plane_sweep_translation_shift():
    """A pure x-translation between frames shifts the prev sampling grid
    by the disparity fx*tx/depth."""
    h, w, c = 16, 32, 2
    depths = jnp.asarray(np.array([10.0], dtype=np.float32))
    cam2img = _kitti_cam2img()
    tx = 0.5
    cur2prev = np.eye(4, dtype=np.float32)
    cur2prev[0, 3] = tx  # prev cam shifted
    cur_grid, prev_grid = cost_volume.plane_sweep_grids(
        depths, jnp.asarray(cam2img), jnp.asarray(cur2prev),
        (h, w), 4, 1, jnp.asarray(float(w)), jnp.asarray(0.0), jnp.zeros(2),
        jnp.asarray(1.0))
    disparity = 721.5 * tx / 10.0
    np.testing.assert_allclose(
        np.asarray(prev_grid[..., 0] - cur_grid[..., 0]),
        np.full((1, 4, 8), disparity), atol=1e-2)
    np.testing.assert_allclose(np.asarray(prev_grid[..., 1]),
                               np.asarray(cur_grid[..., 1]), atol=1e-3)


def test_plane_sweep_flip_roundtrip():
    """Flip undo/redo must cancel for the cur grid."""
    h, w = 16, 32
    depths = jnp.asarray(np.array([5.0, 20.0], dtype=np.float32))
    cam2img = jnp.asarray(_kitti_cam2img())
    cur_g0, _ = cost_volume.plane_sweep_grids(
        depths, cam2img, jnp.eye(4), (h, w), 4, 1, jnp.asarray(float(w)),
        jnp.asarray(0.0), jnp.zeros(2), jnp.asarray(1.0))
    cur_g1, _ = cost_volume.plane_sweep_grids(
        depths, cam2img, jnp.eye(4), (h, w), 4, 1, jnp.asarray(float(w)),
        jnp.asarray(1.0), jnp.zeros(2), jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(cur_g0), np.asarray(cur_g1),
                               atol=1e-2)


def test_upsampled_softmax_sampling_exact():
    """The lse-map formulation must equal the explicit path:
    upsample x4 (align corners) -> softmax over D -> grid_sample."""
    d, h, w = 6, 8, 10
    up = 4
    pad_shape = (h * up, w * up)
    cost = _rand(d, h, w, seed=3)
    rng = np.random.RandomState(4)
    n = 50
    queries = np.stack([
        rng.uniform(0, pad_shape[1] - 1, n),      # u
        rng.uniform(0, pad_shape[0] - 1, n),      # v
        rng.uniform(2.0, 59.6, n)], -1).astype(np.float32)
    dmin, dmax = 2.0, 59.6

    lse = frustum.depth_softmax_lse_map(
        jnp.asarray(cost), up, pad_shape, chunk=8)
    out = np.asarray(frustum.sample_upsampled_softmax(
        jnp.asarray(cost), lse, jnp.asarray(queries), pad_shape, dmin, dmax,
        up))

    # explicit torch reference
    tcost = torch.from_numpy(cost)[None, None]
    fine = F.interpolate(tcost, scale_factor=up, mode='trilinear',
                         align_corners=True)
    sm = torch.softmax(fine, dim=2)
    gx = queries[:, 0] / (pad_shape[1] - 1) * 2 - 1
    gy = queries[:, 1] / (pad_shape[0] - 1) * 2 - 1
    gz = (queries[:, 2] - dmin) / (dmax - dmin) * 2 - 1
    tgrid = torch.from_numpy(
        np.stack([gx, gy, gz], -1).astype(np.float32))[None, :, None, None, :]
    ref = F.grid_sample(sm, tgrid, align_corners=True)[0, 0, :, 0, 0].numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sample_stereo_volume_masks():
    vol = jnp.asarray(_rand(6, 8, 10, 3))
    pad_shape = (32, 40)
    coord = jnp.asarray([[10.0, 10.0, 30.0],     # inside
                         [-5.0, 10.0, 30.0],     # u < 0
                         [10.0, 10.0, 80.0]])    # depth beyond max
    out, valid2d, valid = frustum.sample_stereo_volume(
        vol, coord, pad_shape, 2.0, 59.6)
    v = np.asarray(valid)
    assert v.tolist() == [True, False, False]
    assert np.all(np.asarray(out)[1:] == 0)
    assert np.asarray(valid2d).tolist() == [True, False, True]


def test_packed_samplers_match_unpacked():
    from dfm_tpu.ops import packed_sample as PS
    rng = np.random.RandomState(5)
    feat = jnp.asarray(rng.randn(9, 11, 5).astype(np.float32))
    coords = jnp.asarray(np.stack([rng.uniform(-1, 11, 300),
                                   rng.uniform(-1, 9, 300)], -1)
                         .astype(np.float32))
    a = grid_sample.bilinear_sample(feat, coords)
    b = PS.packed_bilinear_sample(PS.pack_taps_2d(feat), coords, 5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    vol = jnp.asarray(rng.randn(6, 7, 8, 3).astype(np.float32))
    c3 = jnp.asarray(np.stack([rng.uniform(-1, 8, 300),
                               rng.uniform(-1, 7, 300),
                               rng.uniform(-1, 6, 300)], -1)
                     .astype(np.float32))
    a3 = grid_sample.trilinear_sample(vol, c3)
    b3 = PS.packed_trilinear_sample(PS.pack_taps_3d(vol), c3, 3)
    np.testing.assert_allclose(np.asarray(a3), np.asarray(b3), atol=1e-5)


def test_packed_fine_softmax_matches_lse_formulation():
    d, h, w = 6, 8, 10
    up = 4
    pad_shape = (h * up, w * up)
    cost = jnp.asarray(_rand(d, h, w, seed=9))
    rng = np.random.RandomState(10)
    q = jnp.asarray(np.stack([
        rng.uniform(0, pad_shape[1] - 1, 64),
        rng.uniform(0, pad_shape[0] - 1, 64),
        rng.uniform(2.0, 59.6, 64)], -1).astype(np.float32))
    lse = frustum.depth_softmax_lse_map(cost, up, pad_shape, chunk=8)
    ref = np.asarray(frustum.sample_upsampled_softmax(
        cost, lse, q, pad_shape, 2.0, 59.6, up))
    packed = frustum.build_packed_fine_softmax(
        cost, up, pad_shape, dtype=jnp.float32)
    out = np.asarray(frustum.sample_fine_softmax_packed(
        packed, q, pad_shape, 2.0, 59.6, up))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_conv3dsum_matches_lax_conv3d():
    import flax.linen as nn
    from dfm_tpu.models.layers import Conv3DSum
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 6, 8, 10, 4).astype(np.float32))
    for strides in ((1, 1, 1), (2, 2, 2)):
        m = Conv3DSum(5, (3, 3, 3), strides)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        ref = jax.lax.conv_general_dilated(
            x, v['params']['kernel'], strides,
            [(1, 1), (1, 1), (1, 1)],   # torch-style symmetric padding
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)


def test_base27_softmax_matches_lse_formulation():
    from dfm_tpu.ops.frustum import (build_base27_tables,
                                     sample_softmax_base27)
    d, h, w = 6, 8, 10
    up = 4
    pad_shape = (h * up, w * up)
    cost = jnp.asarray(_rand(d, h, w, seed=13))
    rng = np.random.RandomState(14)
    # interior queries (at the 1-px border band the legacy lse-path
    # border-replicates while torch zero-pads; base27 is torch-faithful)
    q = jnp.asarray(np.stack([
        rng.uniform(0, pad_shape[1] - 1, 200),
        rng.uniform(0, pad_shape[0] - 1, 200),
        rng.uniform(2.0, 59.6, 200)], -1).astype(np.float32))
    lse = frustum.depth_softmax_lse_map(cost, up, pad_shape)
    ref = np.asarray(frustum.sample_upsampled_softmax(
        cost, lse, q, pad_shape, 2.0, 59.6, up))
    b27, lse4 = build_base27_tables(cost, up, pad_shape)
    out = np.asarray(sample_softmax_base27(
        b27, lse4, q, pad_shape, 2.0, 59.6, up))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    # torch oracle on the same interior queries
    import torch
    import torch.nn.functional as F
    tcost = torch.from_numpy(np.asarray(cost))[None, None]
    fine = F.interpolate(tcost, scale_factor=up, mode='trilinear',
                         align_corners=True)
    sm = torch.softmax(fine, dim=2)
    qn = np.asarray(q)
    gx = qn[:, 0] / (pad_shape[1] - 1) * 2 - 1
    gy = qn[:, 1] / (pad_shape[0] - 1) * 2 - 1
    gz = (qn[:, 2] - 2.0) / (59.6 - 2.0) * 2 - 1
    tgrid = torch.from_numpy(np.stack([gx, gy, gz], -1).astype(
        np.float32))[None, :, None, None, :]
    tref = F.grid_sample(sm, tgrid, align_corners=True)[
        0, 0, :, 0, 0].numpy()
    np.testing.assert_allclose(out, tref, atol=1e-5)


def test_base27_hat_matches_base27():
    """The hat-weight formulation (no take_along_axis) must equal the
    select-based base27 sampler and the explicit lse path exactly."""
    from dfm_tpu.ops.frustum import (build_base27_tables,
                                     sample_softmax_base27,
                                     sample_softmax_base27_hat)
    d, h, w = 6, 8, 10
    up = 4
    pad_shape = (h * up, w * up)
    cost = jnp.asarray(_rand(d, h, w, seed=21))
    rng = np.random.RandomState(22)
    # include out-of-range queries to exercise the validity masking
    q = jnp.asarray(np.stack([
        rng.uniform(-5, pad_shape[1] + 5, 500),
        rng.uniform(-5, pad_shape[0] + 5, 500),
        rng.uniform(0.0, 70.0, 500)], -1).astype(np.float32))
    b27, lse4 = build_base27_tables(cost, up, pad_shape)
    ref = np.asarray(sample_softmax_base27(
        b27, lse4, q, pad_shape, 2.0, 59.6, up))
    out = np.asarray(sample_softmax_base27_hat(
        b27, lse4, q, pad_shape, 2.0, 59.6, up))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    # and vs the packed-fine hot path (previous production formulation)
    packed = frustum.build_packed_fine_softmax(
        cost, up, pad_shape, dtype=jnp.float32)
    ref2 = np.asarray(frustum.sample_fine_softmax_packed(
        packed, q, pad_shape, 2.0, 59.6, up))
    np.testing.assert_allclose(out, ref2, atol=1e-5)


def test_packed_samplers_bf16_selector_path():
    """bf16 tables take the block-diagonal selector-matmul combine;
    must match the f32 slice path within bf16 tolerance."""
    from dfm_tpu.ops import packed_sample as PS
    rng = np.random.RandomState(30)
    vol = rng.randn(6, 7, 8, 32).astype(np.float32)
    c3 = jnp.asarray(np.stack([rng.uniform(-1, 8, 300),
                               rng.uniform(-1, 7, 300),
                               rng.uniform(-1, 6, 300)], -1)
                     .astype(np.float32))
    ref = np.asarray(PS.packed_trilinear_sample(
        PS.pack_taps_3d(jnp.asarray(vol)), c3, 32))
    out = np.asarray(PS.packed_trilinear_sample(
        PS.pack_taps_3d(jnp.asarray(vol).astype(jnp.bfloat16)), c3, 32))
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)

    feat = rng.randn(9, 11, 32).astype(np.float32)
    c2 = jnp.asarray(np.stack([rng.uniform(-1, 11, 300),
                               rng.uniform(-1, 9, 300)], -1)
                     .astype(np.float32))
    ref2 = np.asarray(PS.packed_bilinear_sample(
        PS.pack_taps_2d(jnp.asarray(feat)), c2, 32))
    out2 = np.asarray(PS.packed_bilinear_sample(
        PS.pack_taps_2d(jnp.asarray(feat).astype(jnp.bfloat16)), c2, 32))
    np.testing.assert_allclose(out2, ref2, atol=0.05, rtol=0.05)
