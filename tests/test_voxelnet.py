"""Standalone VoxelNet LiDAR detector test."""

import jax
import jax.numpy as jnp
import numpy as np

from dfm_tpu.models import (VoxelNet, VoxelNetConfig, voxelnet_loss,
                            voxelnet_predict)


def test_voxelnet_end_to_end():
    cfg = VoxelNetConfig(voxel_size=(3.6, 3.8, 0.5), nms_pre=128, max_num=8)
    model = VoxelNet(cfg=cfg)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(np.stack([
        rng.uniform(3, 55, 800), rng.uniform(-25, 25, 800),
        rng.uniform(-2.5, 0.5, 800)], -1).astype(np.float32))[None]
    pm = jnp.ones((1, 800), bool)
    v = model.init(jax.random.PRNGKey(0), pts, pm)
    out = jax.jit(lambda vv: model.apply(vv, pts, pm))(v)
    nz, ny, nx = cfg.voxel_grid_size()
    assert out['cls_score'].shape == (1, ny, nx, 18)

    gen = cfg.anchor_generator()
    grid = gen.grid_anchors((ny, nx))
    a = grid[0, ny // 2, nx // 2, 0, 0]
    gt = np.concatenate([a[:6], [0.05]]).astype(np.float32)
    batch = dict(gt_boxes=jnp.asarray(gt)[None, None],
                 gt_labels=jnp.zeros((1, 1), jnp.int32),
                 gt_mask=jnp.ones((1, 1), bool))
    total, losses = jax.jit(lambda o: voxelnet_loss(o, batch, cfg))(out)
    assert np.isfinite(float(total)) and float(losses['loss_bbox']) > 0
    det = jax.jit(lambda o: voxelnet_predict(o, cfg))(out)
    assert det['boxes3d'].shape == (1, 8, 7)
