"""FCOS3D monocular path tests (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.models import (FCOS3DConfig, FCOSMono3D, fcos_mono3d_loss,
                            fcos_mono3d_predict)

B, H, W = 1, 64, 128


@pytest.fixture(scope='module')
def setup():
    cfg = FCOS3DConfig(in_channels=32, feat_channels=32, stacked_convs=1,
                       nms_pre=128, max_num=8)
    model = FCOSMono3D(cfg=cfg, backbone_depth=50)
    img = jnp.asarray(
        np.random.RandomState(0).randn(B, H, W, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    outs = jax.jit(lambda v, i: model.apply(v, i, train=False))(
        variables, img)
    return cfg, model, img, variables, outs


def test_level_shapes(setup):
    cfg, model, img, variables, outs = setup
    assert len(outs) == 5
    for o, s in zip(outs, cfg.strides):
        he = (H + s - 1) // s
        we = (W + s - 1) // s
        assert o['cls_score'].shape == (B, he, we, cfg.num_classes)
        assert o['bbox_pred'].shape == (B, he, we, 7)
        assert np.isfinite(np.asarray(o['bbox_pred'])).all()
        # depth and size decoded with exp -> positive
        assert (np.asarray(o['bbox_pred'])[..., 2:6] > 0).all()


def _mono_batch():
    g = 2
    gt_boxes_cam = np.zeros((B, g, 7), np.float32)
    gt_boxes_cam[0, 0] = [1.0, 1.5, 12.0, 3.9, 1.5, 1.6, 0.2]
    gt_boxes_cam[0, 1] = [-2.0, 1.4, 20.0, 0.8, 1.7, 0.6, -0.5]
    fx = 100.0
    centers2d = np.zeros((B, g, 2), np.float32)
    depths = np.zeros((B, g), np.float32)
    bboxes2d = np.zeros((B, g, 4), np.float32)
    for i in range(g):
        x, y, z = gt_boxes_cam[0, i, :3]
        u = fx * x / z + W / 2
        v = fx * (y - gt_boxes_cam[0, i, 4] / 2) / z + H / 2
        centers2d[0, i] = (u, v)
        depths[0, i] = z
        bboxes2d[0, i] = (u - 15, v - 10, u + 15, v + 10)
    return dict(
        gt_bboxes2d=jnp.asarray(bboxes2d),
        centers2d=jnp.asarray(centers2d),
        gt_depths=jnp.asarray(depths),
        gt_boxes_cam=jnp.asarray(gt_boxes_cam),
        gt_labels=jnp.asarray([[0, 1]], dtype=jnp.int32),
        gt_mask=jnp.ones((B, 2), bool)), fx


def test_loss_finite_with_positives(setup):
    cfg, model, img, variables, outs = setup
    batch, fx = _mono_batch()
    total, losses = jax.jit(
        lambda o: fcos_mono3d_loss(o, (H, W), batch, cfg))(outs)
    assert np.isfinite(float(total))
    assert float(losses['loss_offset']) > 0
    assert float(losses['loss_centerness']) > 0


def test_loss_no_gt(setup):
    cfg, model, img, variables, outs = setup
    batch, _ = _mono_batch()
    batch['gt_mask'] = jnp.zeros((B, 2), bool)
    total, losses = jax.jit(
        lambda o: fcos_mono3d_loss(o, (H, W), batch, cfg))(outs)
    assert np.isfinite(float(total))
    assert float(losses['loss_offset']) == 0.0


def test_predict_shapes(setup):
    cfg, model, img, variables, outs = setup
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 100.0
    cam[0, 2] = W / 2
    cam[1, 2] = H / 2
    det = jax.jit(lambda o: fcos_mono3d_predict(
        o, (H, W), jnp.asarray(cam)[None], cfg))(outs)
    assert det['boxes3d'].shape == (B, cfg.max_num, 7)
    assert np.isfinite(np.asarray(det['boxes3d'])).all()


def test_grads_flow(setup):
    cfg, model, img, variables, outs = setup
    batch, _ = _mono_batch()

    def loss_fn(params):
        o = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            img, train=False)
        return fcos_mono3d_loss(o, (H, W), batch, cfg)[0]

    g = jax.jit(jax.grad(loss_fn))(variables['params'])
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    nonzero = sum(float(jnp.abs(x).sum()) > 0 for x in flat)
    assert nonzero / len(flat) > 0.8


def test_pgd_head_and_loss(setup):
    """PGD extensions: depth-classifier fusion + uncertainty loss."""
    from dfm_tpu.models import PGDConfig, PGDHead, pgd_loss
    from dfm_tpu.models.detectors.fcos_mono3d import mono_level_points
    from dfm_tpu.models.backbones.resnet import ResNet
    from dfm_tpu.models.necks.fpn import FPN
    import flax.linen as nn

    cfg = PGDConfig(in_channels=32, feat_channels=32, stacked_convs=1,
                    depth_branch=(16,), nms_pre=64, max_num=8)

    class PGDNet(nn.Module):
        @nn.compact
        def __call__(self, img, train=False):
            feats = ResNet(depth=50, name='backbone')(img, train)
            fpn = FPN(out_channels=32, num_outs=5, start_level=1,
                      name='neck')(feats, train)
            return PGDHead(cfg=cfg, name='head')(fpn, train)

    model = PGDNet()
    img = jnp.asarray(
        np.random.RandomState(1).randn(B, H, W, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    outs = jax.jit(lambda v, i: model.apply(v, i))(variables, img)
    assert 'depth_cls_pred' in outs[0]
    assert outs[0]['depth_cls_pred'].shape[-1] == cfg.num_depth_cls
    assert outs[0]['weight'].shape[-1] == 1
    # fused depth positive (prob expectation >= 0, direct via exp > 0)
    assert (np.asarray(outs[0]['bbox_pred'][..., 2]) > -1e-3).all()

    batch, _ = _mono_batch()
    pts = mono_level_points((H, W), cfg)
    losses = jax.jit(lambda o: pgd_loss(o, pts, cfg, batch))(outs)
    assert 'loss_depth_uncertain' in losses
    assert np.isfinite(float(sum(losses.values())))


def test_pgd_full_branches(setup):
    """PGD completions: keypoints, bbox2d, projected-box consistency
    (reference pgd_head.py:265-439, 723-751)."""
    from dfm_tpu.models import PGDConfig, PGDHead, pgd_loss
    from dfm_tpu.models.detectors.fcos_mono3d import mono_level_points
    from dfm_tpu.models.backbones.resnet import ResNet
    from dfm_tpu.models.necks.fpn import FPN
    import flax.linen as nn

    cfg = PGDConfig(in_channels=32, feat_channels=32, stacked_convs=1,
                    depth_branch=(16,), nms_pre=64, max_num=8,
                    pred_keypoints=True, pred_bbox2d=True)

    class PGDNet(nn.Module):
        @nn.compact
        def __call__(self, img, train=False):
            feats = ResNet(depth=50, name='backbone')(img, train)
            fpn = FPN(out_channels=32, num_outs=5, start_level=1,
                      name='neck')(feats, train)
            return PGDHead(cfg=cfg, name='head')(fpn, train)

    model = PGDNet()
    img = jnp.asarray(
        np.random.RandomState(2).randn(B, H, W, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    outs = jax.jit(lambda v, i: model.apply(v, i))(variables, img)
    assert outs[0]['kpts_pred'].shape[-1] == 16
    assert outs[0]['bbox2d_pred'].shape[-1] == 4
    assert (np.asarray(outs[0]['kpts_pred']) <= 1).all()
    assert (np.asarray(outs[0]['bbox2d_pred']) >= 0).all()

    batch, fx = _mono_batch()
    cam2img = np.eye(4, dtype=np.float32)
    cam2img[0, 0] = cam2img[1, 1] = fx
    cam2img[0, 2] = W / 2
    cam2img[1, 2] = H / 2
    cam2img = np.tile(cam2img[None], (B, 1, 1))
    pts = mono_level_points((H, W), cfg)
    losses = jax.jit(
        lambda o: pgd_loss(o, pts, cfg, batch,
                           cam2img=jnp.asarray(cam2img)))(outs)
    for k in ('loss_kpts', 'loss_bbox2d', 'loss_consistency',
              'loss_depth_uncertain'):
        assert k in losses, k
        assert np.isfinite(float(losses[k])), k
    # grads flow into the new branches
    import jax as _jax

    def loss_fn(v):
        o = model.apply(v, img, train=False)
        ls = pgd_loss(o, pts, cfg, batch, cam2img=jnp.asarray(cam2img))
        return sum(ls.values())
    grads = _jax.grad(loss_fn)(variables)
    gk = grads['params']['head']['conv_kpts']['kernel']
    gb = grads['params']['head']['conv_bbox2d']['kernel']
    assert np.isfinite(np.asarray(gk)).all()
    assert float(np.abs(np.asarray(gb)).sum()) > 0
