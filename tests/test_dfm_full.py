"""Full DfM training composite: 3D + 2D aux + depth + imitation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dfm_tpu.models import (ATSS2DConfig, BatchMeta, DfMConfig, DfMFull,
                            dfm_full_loss)

B, H, W = 1, 64, 128


def test_dfm_full_all_losses():
    cfg = DfMConfig(depth_num_bins=16, voxel_size=(7.2, 7.6, 1.0),
                    num_depth_sample_pixels=16)
    acfg = ATSS2DConfig(in_channels=16, feat_channels=16, stacked_convs=1)
    model = DfMFull(cfg=cfg, atss_cfg=acfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, 2, H, W, 3).astype(np.float32))
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 100.0
    cam[0, 2], cam[1, 2] = W / 2, H / 2
    meta = BatchMeta.identity(B, jnp.asarray(cam)[None])
    meta = dataclasses.replace(meta, org_w=jnp.full((B,), float(W)))
    pts = jnp.asarray(np.stack([
        rng.uniform(3, 55, 400), rng.uniform(-25, 25, 400),
        rng.uniform(-2.5, 0.5, 400)], -1).astype(np.float32))[None]
    pm = jnp.ones((B, 400), bool)

    variables = model.init(jax.random.PRNGKey(0), img, meta, pts, pm,
                           train=False)
    out = jax.jit(lambda v: model.apply(v, img, meta, pts, pm,
                                        train=False))(variables)
    assert 'outs_2d' in out and 'imitation' in out

    gen = cfg.anchor_generator()
    nz, ny, nx = cfg.voxel_grid_size()
    grid = gen.grid_anchors((ny, nx))
    a = grid[0, ny // 2, nx // 2, 0, 0]
    gt = np.concatenate([a[:6], [0.05]]).astype(np.float32)
    batch = dict(
        gt_boxes=jnp.asarray(gt)[None, None],
        gt_labels=jnp.zeros((B, 1), jnp.int32),
        gt_mask=jnp.ones((B, 1), bool),
        depth_img=jnp.asarray(
            rng.rand(B, H, W).astype(np.float32) * 50 + 3),
        depth_fgmask_img=jnp.ones((B, H, W), jnp.int32),
        gt_bboxes2d=jnp.asarray([[[30.0, 20.0, 90.0, 50.0]]]),
        centers2d=jnp.asarray([[[60.0, 35.0]]]))
    total, losses = jax.jit(lambda o: dfm_full_loss(
        o, batch, cfg, acfg, (H, W), jax.random.PRNGKey(1)))(out)
    assert np.isfinite(float(total))
    for key in ('loss_cls', 'loss_bbox', 'loss_dense_depth',
                'loss_cls2d', 'loss_bbox2d', 'loss_imitation'):
        assert key in losses, key
        assert np.isfinite(float(losses[key])), key


# compile-heavy: full tier only (pytest -m "not slow" skips)
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
