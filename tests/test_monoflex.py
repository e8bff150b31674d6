"""MonoFlex head: forward, loss, multibin orientation, decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.models.heads.monoflex import (MonoFlexConfig,
                                           MonoFlexHead,
                                           monoflex_decode,
                                           monoflex_loss,
                                           multibin_loss)


@pytest.fixture(scope='module')
def setup():
    cfg = MonoFlexConfig(num_classes=3, feat_channels=16, topk=8)
    head = MonoFlexHead(cfg)
    feat = jnp.zeros((1, 16, 24, 8))
    v = head.init(jax.random.PRNGKey(0), feat)
    return cfg, head, v, feat


def test_forward_shapes(setup):
    cfg, head, v, feat = setup
    outs = head.apply(v, feat)
    assert outs['heatmap'].shape == (1, 16, 24, 3)
    assert outs['kpts'].shape == (1, 16, 24, 20)
    assert outs['ori_cls'].shape[-1] == 4
    assert outs['ori_off'].shape[-1] == 8


def test_loss_finite(setup):
    cfg, head, v, feat = setup
    outs = head.apply(v, feat)
    g = 2
    batch = dict(
        gt_boxes_cam=jnp.asarray(
            [[[1.0, 1.5, 10.0, 3.9, 1.5, 1.6, 0.3],
              [-2.0, 1.5, 20.0, 0.8, 1.8, 0.7, -0.5]]]),
        centers2d=jnp.asarray([[[40.0, 30.0], [70.0, 40.0]]]),
        kpts2d=jnp.asarray(np.random.RandomState(0)
                           .rand(1, g, 10, 2) * 60 + 10, jnp.float32),
        gt_labels=jnp.asarray([[0, 1]]),
        gt_mask=jnp.asarray([[True, True]]),
        gt_alphas=jnp.asarray([[0.2, -1.4]]),
    )
    cam = jnp.eye(4).at[0, 0].set(700.).at[1, 1].set(700.)
    losses = monoflex_loss(outs, batch, cfg, cam)
    for k, val in losses.items():
        assert jnp.isfinite(val), k
    assert {'loss_heatmap', 'loss_ori', 'loss_depth',
            'loss_kpts'} <= set(losses)


def test_multibin_loss_zero_at_exact():
    """alpha exactly at a bin center with matching sin/cos -> small."""
    alpha = jnp.asarray([[0.0]])
    w = jnp.ones((1, 1))
    # bin 0 active: logits strongly positive for every in-margin bin
    from dfm_tpu.models.heads.monoflex import BIN_CENTERS, BIN_MARGIN
    diff = alpha[..., None] - jnp.asarray(BIN_CENTERS)[None, None]
    diff = (diff + np.pi) % (2 * np.pi) - np.pi
    in_bin = jnp.abs(diff) < (np.pi / 2 + BIN_MARGIN)
    cls = jnp.where(in_bin, 20.0, -20.0)
    off = jnp.stack([jnp.sin(diff), jnp.cos(diff)], -1).reshape(1, 1, 8)
    loss = multibin_loss(cls, off, alpha, w, 1.0)
    assert float(loss) < 1e-3


def test_decode_outputs(setup):
    cfg, head, v, feat = setup
    outs = head.apply(v, feat)
    cam = jnp.eye(4).at[0, 0].set(700.).at[1, 1].set(700.) \
        .at[0, 2].set(48.).at[1, 2].set(32.)
    det = monoflex_decode(jax.tree.map(lambda x: x[0], outs), cam, cfg)
    assert det['boxes_3d'].shape == (cfg.topk, 7)
    assert jnp.isfinite(det['boxes_3d']).all()
    assert (det['boxes_3d'][:, 2] > 0).all()   # positive depth


def test_detector_builds():
    from dfm_tpu.models import build_detector
    from dfm_tpu.runtime.config import load_config
    import os
    cfg = load_config(os.path.join(os.path.dirname(__file__), '..',
                                   'configs', 'monoflex_dla34_kitti.py'))
    h = build_detector(cfg.model.to_dict())
    assert h.type == 'MonoFlex'


def test_edge_fusion_boundary_only():
    """use_edge_fusion adds a boundary-sequence correction to the cls
    heatmap + offset (reference EdgeFusionModule): interior pixels are
    bit-identical to the unfused head; boundary pixels move. The
    truncated-object case: objects whose centers clip to the image edge
    get their predictions from exactly this path."""
    cfg = MonoFlexConfig(num_classes=3, feat_channels=16, topk=8)
    cfg_e = MonoFlexConfig(num_classes=3, feat_channels=16, topk=8,
                           use_edge_fusion=True)
    head, head_e = MonoFlexHead(cfg), MonoFlexHead(cfg_e)
    feat = jax.random.normal(jax.random.PRNGKey(3), (1, 12, 16, 8))
    v_e = head_e.init(jax.random.PRNGKey(0), feat)
    assert 'edge_cls' in v_e['params'] and 'edge_offset' in v_e['params']
    # unfused = same params minus the edge modules (the bn batch_stats
    # in v_e belong only to the edge stacks; the base head is GN)
    v = {'params': {k: p for k, p in v_e['params'].items()
                    if not k.startswith('edge_')}}
    out_e = head_e.apply(v_e, feat)
    out = head.apply(v, feat)
    hm_e, hm = out_e['heatmap'], out['heatmap']
    off_e, off = out_e['offset'], out['offset']
    # interior identical
    np.testing.assert_allclose(hm_e[:, 1:-1, 1:-1], hm[:, 1:-1, 1:-1],
                               atol=0)
    np.testing.assert_allclose(off_e[:, 1:-1, 1:-1], off[:, 1:-1, 1:-1],
                               atol=0)
    # boundary moved (random init edge convs are nonzero)
    assert float(jnp.abs(hm_e[:, 0] - hm[:, 0]).max()) > 0
    assert float(jnp.abs(off_e[:, :, 0] - off[:, :, 0]).max()) > 0
    # untouched branches bit-identical
    np.testing.assert_allclose(out_e['dims'], out['dims'], atol=0)
    # gradients flow into the edge stack through the loss surface
    def s(p):
        return MonoFlexHead(cfg_e).apply(
            {'params': p,
             'batch_stats': v_e.get('batch_stats', {})}, feat)[
            'heatmap'].sum()
    g = jax.grad(s)(v_e['params'])
    gmax = max(float(jnp.abs(x).max())
               for x in jax.tree_util.tree_leaves(g['edge_cls']))
    assert gmax > 0
