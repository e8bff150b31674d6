"""End-to-end DfM model tests on tiny shapes (CPU).

The reference has no dedicated DfM forward test (SURVEY.md 4); here the
full detector gets forward / loss / gradient / predict coverage.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.models import BatchMeta, DfM, DfMConfig, dfm_loss, dfm_predict

B, H, W = 1, 64, 128


@pytest.fixture(scope='module')
def setup():
    cfg = DfMConfig(depth_num_bins=48, voxel_size=(3.6, 3.8, 0.5),
                    nms_pre=128, max_num=8, num_depth_sample_pixels=64)
    model = DfM(cfg=cfg)
    img = jnp.asarray(
        np.random.RandomState(0).randn(B, 2, H, W, 3).astype(np.float32))
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 200.0
    cam[0, 2] = W / 2
    cam[1, 2] = H / 2
    meta = BatchMeta.identity(B, jnp.tile(jnp.asarray(cam)[None], (B, 1, 1)))
    meta = dataclasses.replace(meta, org_w=jnp.full((B,), float(W)))
    variables = model.init(jax.random.PRNGKey(0), img, meta, train=False)
    outputs = jax.jit(
        lambda v, i, m: model.apply(v, i, m, train=False))(
            variables, img, meta)
    return cfg, model, img, meta, variables, outputs


def test_forward_shapes(setup):
    cfg, model, img, meta, variables, out = setup
    nz, ny, nx = cfg.voxel_grid_size()
    assert out['cls_score'].shape == (B, ny, nx, 6 * 3)
    assert out['bbox_pred'].shape == (B, ny, nx, 6 * 7)
    assert out['dir_pred'].shape == (B, ny, nx, 6 * 2)
    assert out['depth_cost'].shape == (B, cfg.num_downsampled_bins,
                                       H // 4, W // 4)
    assert out['bev_feat'].shape == (B, ny, nx, cfg.bev_channels)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_predict_static_shapes(setup):
    cfg, model, img, meta, variables, out = setup
    det = jax.jit(lambda o: dfm_predict(o, cfg))(out)
    assert det['boxes3d'].shape == (B, cfg.max_num, 7)
    assert det['scores'].shape == (B, cfg.max_num)
    assert det['labels'].shape == (B, cfg.max_num)
    assert np.isfinite(np.asarray(det['boxes3d'])).all()


def _batch_with_gt_on_anchor(cfg):
    # place a Car gt exactly on an anchor center so assignment finds a pos
    gen = cfg.anchor_generator()
    nz, ny, nx = cfg.voxel_grid_size()
    grid = gen.grid_anchors((ny, nx))
    a = grid[0, ny // 2, nx // 2, 0, 0]  # car anchor, rot 0
    gt = np.concatenate([a[:6], [0.05]]).astype(np.float32)
    return dict(
        gt_boxes=jnp.asarray(gt)[None, None],
        gt_labels=jnp.zeros((B, 1), jnp.int32),
        gt_mask=jnp.ones((B, 1), bool),
        depth_img=jnp.asarray(
            np.random.RandomState(1).rand(B, H, W).astype(np.float32) * 50
            + 3),
        depth_fgmask_img=jnp.ones((B, H, W), jnp.int32))


def test_loss_finite_and_positive(setup):
    cfg, model, img, meta, variables, out = setup
    batch = _batch_with_gt_on_anchor(cfg)
    total, losses = jax.jit(
        lambda o, bt: dfm_loss(o, bt, cfg, jax.random.PRNGKey(1)))(out, batch)
    assert np.isfinite(float(total))
    assert float(losses['loss_bbox']) > 0    # a positive was assigned
    assert float(losses['loss_dir']) > 0
    assert float(losses['loss_dense_depth']) > 0


def test_grads_flow_to_all_params(setup):
    cfg, model, img, meta, variables, out = setup
    batch = _batch_with_gt_on_anchor(cfg)

    def loss_fn(params):
        o = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            img, meta, train=False)
        total, _ = dfm_loss(o, batch, cfg, jax.random.PRNGKey(1))
        return total

    grads = jax.jit(jax.grad(loss_fn))(variables['params'])
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in flat)
    # all but a handful of params (e.g. dead branches) must receive grads
    assert nonzero / len(flat) > 0.9


def test_batch_size_two(setup):
    """The reference asserts bs==1 in the stereo path; ours must not."""
    cfg, model, img, meta, variables, _ = setup
    img2 = jnp.concatenate([img, img], axis=0)
    meta2 = jax.tree.map(
        lambda x: jnp.concatenate([x, x], axis=0), meta)
    out = jax.jit(lambda v, i, m: model.apply(v, i, m, train=False))(
        variables, img2, meta2)
    assert out['cls_score'].shape[0] == 2
    np.testing.assert_allclose(np.asarray(out['cls_score'][0]),
                               np.asarray(out['cls_score'][1]), atol=1e-5)
