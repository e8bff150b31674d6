"""2D auxiliary ATSS head tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dfm_tpu.models import ATSS2DConfig, ATSS2DHead, atss2d_loss
from dfm_tpu.models.heads.atss2d import atss_assign, level_anchors
from dfm_tpu.models.necks.fpn import FPN

B, H, W = 1, 64, 128


def test_atss_assign_basic():
    cfg = ATSS2DConfig()
    sizes = [((H + s - 1) // s, (W + s - 1) // s) for s in cfg.strides]
    anchors = np.concatenate([
        level_anchors(sz, s, cfg.anchor_scale)
        for sz, s in zip(sizes, cfg.strides)], 0)
    level_sizes = [sz[0] * sz[1] for sz in sizes]
    gt = jnp.asarray([[30.0, 20.0, 90.0, 50.0],
                      [0.0, 0.0, 0.0, 0.0]])
    ctr = jnp.asarray([[60.0, 35.0], [0.0, 0.0]])
    gm = jnp.asarray([True, False])
    assigned, ious = atss_assign(anchors, level_sizes, gt, ctr, gm)
    a = np.asarray(assigned)
    assert (a == 0).sum() >= 1          # some positives for the real gt
    assert (a == 1).sum() == 0          # none for the padded gt


def test_atss2d_head_loss():
    cfg = ATSS2DConfig(in_channels=16, feat_channels=16, stacked_convs=1)
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, feat, train=False):
            fpn = FPN(out_channels=16, num_outs=5, start_level=0,
                      name='neck')([feat], train)
            return ATSS2DHead(cfg=cfg, name='head')(fpn, train)

    model = Net()
    feat = jnp.asarray(
        np.random.RandomState(0).randn(B, H // 4, W // 4, 16)
        .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), feat)
    outs = jax.jit(lambda v, f: model.apply(v, f))(variables, feat)
    assert len(outs) == 5
    batch = dict(
        gt_bboxes2d=jnp.asarray([[[30.0, 20.0, 90.0, 50.0]]]),
        centers2d=jnp.asarray([[[60.0, 35.0]]]),
        gt_labels=jnp.zeros((B, 1), jnp.int32),
        gt_mask=jnp.ones((B, 1), bool))
    losses = jax.jit(lambda o: atss2d_loss(o, (H, W), batch, cfg))(outs)
    total = float(sum(losses.values()))
    assert np.isfinite(total)
    assert float(losses['loss_bbox2d']) > 0
