"""LiDAR teacher + imitation subsystem tests."""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dfm_tpu.models import (BatchMeta, DfMConfig, DfMWithTeacher,
                            cw_scale_normalize, dfm_loss_with_imitation,
                            imitation_loss, voxelize_mean)
from dfm_tpu.models.detectors.dfm_with_teacher import bev_cell_centers


def test_voxelize_mean():
    pcr = (0, 0, 0, 4, 4, 2)
    pts = jnp.asarray([[0.5, 0.5, 0.5], [0.7, 0.3, 0.1],   # same voxel
                       [3.5, 3.5, 1.5],                     # far voxel
                       [10.0, 0.0, 0.0]])                   # outside
    mask = jnp.ones((4,), bool)
    vox, cnt = voxelize_mean(pts, mask, pcr, (1.0, 1.0, 1.0), (2, 4, 4))
    assert vox.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(cnt[0, 0, 0]), 2)
    np.testing.assert_allclose(np.asarray(vox[0, 0, 0]),
                               [0.6, 0.4, 0.3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cnt[1, 3, 3]), 1)
    assert np.asarray(cnt).sum() == 3  # outside point dropped


def test_cw_scale_normalize():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4) * 5)
    n = cw_scale_normalize(x)
    mean_abs = np.abs(np.asarray(n)).mean(axis=(1, 2))
    np.testing.assert_allclose(mean_abs, np.ones((1, 4)), atol=1e-5)


def test_imitation_loss_masking():
    cfg = DfMConfig(depth_num_bins=16, voxel_size=(7.2, 7.6, 1.0))
    centers = jnp.asarray(bev_cell_centers(cfg))
    b, ny, nx, c = 1, 8, 8, 4
    student = jnp.ones((b, ny, nx, c)) * 0.5
    teacher = jnp.ones((b, ny, nx, c)) * 2
    gt = jnp.asarray([[[30.0, 0.0, -1.0, 10.0, 10.0, 2.0, 0.0]]])
    gm = jnp.ones((1, 1), bool)
    loss = imitation_loss(student, teacher, centers, gt, gm)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # no gt -> loss 0
    loss0 = imitation_loss(student, teacher, centers, gt,
                           jnp.zeros((1, 1), bool))
    np.testing.assert_allclose(float(loss0), 0.0, atol=1e-7)


def test_dfm_with_teacher_end_to_end():
    cfg = DfMConfig(depth_num_bins=16, voxel_size=(7.2, 7.6, 1.0),
                    num_depth_sample_pixels=16)
    model = DfMWithTeacher(cfg=cfg)
    b, h, w = 1, 32, 64
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(b, 2, h, w, 3).astype(np.float32))
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 100.0
    cam[0, 2] = w / 2
    cam[1, 2] = h / 2
    meta = BatchMeta.identity(b, jnp.tile(jnp.asarray(cam)[None],
                                          (b, 1, 1)))
    meta = dataclasses.replace(meta, org_w=jnp.full((b,), float(w)))
    pts = jnp.asarray(
        np.stack([rng.uniform(3, 50, 500), rng.uniform(-20, 20, 500),
                  rng.uniform(-2.5, 0.5, 500)], -1).astype(np.float32))[None]
    pmask = jnp.ones((b, 500), bool)

    variables = model.init(jax.random.PRNGKey(0), img, meta, pts, pmask,
                           train=False)
    out = jax.jit(lambda v: model.apply(v, img, meta, pts, pmask,
                                        train=False))(variables)
    assert 'imitation' in out
    assert out['imitation']['volume_target'].shape == \
        out['imitation']['volume_pred'].shape

    gen = cfg.anchor_generator()
    nz, ny, nx = cfg.voxel_grid_size()
    grid = gen.grid_anchors((ny, nx))
    a = grid[0, ny // 2, nx // 2, 0, 0]
    gt = np.concatenate([a[:6], [0.05]]).astype(np.float32)
    batch = dict(gt_boxes=jnp.asarray(gt)[None, None],
                 gt_labels=jnp.zeros((b, 1), jnp.int32),
                 gt_mask=jnp.ones((b, 1), bool))
    total, losses = jax.jit(
        lambda o: dfm_loss_with_imitation(o, batch, cfg,
                                          jax.random.PRNGKey(1)))(out)
    assert np.isfinite(float(total))
    assert 'loss_imitation' in losses
    assert float(losses['loss_imitation']) > 0


# compile-heavy: full tier only
pytestmark = pytest.mark.slow
