"""H3DNet: surface/line geometry + primitive supervision + refine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.models.detectors.h3dnet import (H3DNet, H3DNetConfig,
                                             box_surface_line_centers,
                                             h3dnet_loss,
                                             h3dnet_predict)


def test_surface_line_centers_axis_aligned():
    box = jnp.asarray([[1.0, 2.0, 3.0, 2.0, 4.0, 6.0, 0.0]])
    surf, line = box_surface_line_centers(box)
    assert surf.shape == (1, 6, 3) and line.shape == (1, 12, 3)
    s = np.asarray(surf[0])
    # z faces at z +- 3
    assert {6.0, 0.0} == {round(float(v), 4) for v in s[:2, 2]}
    # x faces at x +- 1
    assert {2.0, 0.0} == {round(float(v), 4) for v in s[2:4, 0]}
    # every line center sits on the box surface (max |coord-center| =
    # half-dim in exactly two axes)
    ln = np.asarray(line[0]) - np.array([1, 2, 3])
    half = np.array([1, 2, 3])
    on_face = np.isclose(np.abs(ln), half).sum(axis=1)
    assert (on_face == 2).all()
    # rotation by pi/2 swaps x/y extents of the face centers
    boxr = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 4.0, 6.0, np.pi / 2]])
    sr, _ = box_surface_line_centers(boxr)
    sr = np.asarray(sr[0])
    assert abs(abs(sr[2, 1]) - 1.0) < 1e-5     # x-face now along y
    assert abs(sr[2, 0]) < 1e-5


@pytest.fixture(scope='module')
def tiny():
    cfg = H3DNetConfig(num_classes=4,
                       mean_sizes=tuple((0.8, 0.8, 0.9)
                                        for _ in range(4)),
                       num_proposals=16, num_backbones=2)
    model = H3DNet(cfg=cfg)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(1, 256, 3) * 4, jnp.float32)
    v = model.init(jax.random.PRNGKey(0), pts, train=True)
    return cfg, model, v, pts


def test_h3dnet_forward_loss_grad(tiny):
    cfg, model, v, pts = tiny
    outs, _ = model.apply(v, pts, train=True, mutable=['batch_stats'])
    assert set(outs['prims']) == {'z', 'xy', 'line'}
    assert outs['refined']['raw'].shape == outs['initial']['raw'].shape
    batch = dict(
        gt_boxes=jnp.asarray([[[2.0, 2.0, 1.0, 0.8, 0.8, 0.9, 0.3],
                               [3.0, 1.0, 1.0, 0.8, 0.8, 0.9, 0.0]]]),
        gt_labels=jnp.asarray([[1, 3]]),
        gt_mask=jnp.asarray([[True, True]]))

    def loss_fn(params):
        o, _ = model.apply({'params': params,
                            'batch_stats': v['batch_stats']},
                           pts, train=True, mutable=['batch_stats'])
        return h3dnet_loss(o, batch, cfg)

    (total, losses), g = jax.value_and_grad(
        loss_fn, has_aux=True)(v['params'])
    assert np.isfinite(float(total))
    assert 'prim_z_flag' in losses and 'ref_loss_center' in losses
    for k, val in losses.items():
        assert np.isfinite(float(val)), k
    # refinement path gradient reaches the matcher
    assert float(jnp.abs(g['match0']['kernel']).max()) > 0
    # primitive heads receive gradient
    assert max(float(jnp.abs(x).max()) for x in
               jax.tree_util.tree_leaves(g['prim_line'])) > 0


def test_h3dnet_predict(tiny):
    cfg, model, v, pts = tiny
    outs = model.apply(v, pts, train=False)
    det = h3dnet_predict(outs, cfg)
    assert det['boxes_3d'].shape == (1, 16, 7)
    for x in jax.tree_util.tree_leaves(det):
        assert np.isfinite(np.asarray(x, np.float32)).all()


def test_h3dnet_cues_mode_forward_loss_grad():
    """Reference-structure mode: separate surface/line matchers +
    per-cue objectness/semantic sub-scores and losses
    (h3d_bbox_head.py:118-560)."""
    cfg = H3DNetConfig(num_classes=4,
                       mean_sizes=tuple((0.8, 0.8, 0.9)
                                        for _ in range(4)),
                       num_proposals=16, num_backbones=2,
                       with_cues=True, surface_radius=0.5,
                       line_radius=0.4)
    model = H3DNet(cfg=cfg)
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.rand(1, 256, 3) * 4, jnp.float32)
    v = model.init(jax.random.PRNGKey(0), pts, train=True)
    outs, _ = model.apply(v, pts, train=True, mutable=['batch_stats'])
    assert outs['cues_obj'].shape[2:] == (18, 2)
    assert outs['cues_sem'].shape[2:] == (18, 4)
    batch = dict(
        gt_boxes=jnp.asarray([[[2.0, 2.0, 1.0, 0.8, 0.8, 0.9, 0.3],
                               [3.0, 1.0, 1.0, 0.8, 0.8, 0.9, 0.0]]]),
        gt_labels=jnp.asarray([[1, 3]]),
        gt_mask=jnp.asarray([[True, True]]))

    def loss_fn(params):
        o, _ = model.apply({'params': params,
                            'batch_stats': v['batch_stats']},
                           pts, train=True, mutable=['batch_stats'])
        return h3dnet_loss(o, batch, cfg)

    (total, losses), g = jax.value_and_grad(
        loss_fn, has_aux=True)(v['params'])
    assert np.isfinite(float(total))
    assert 'cues_objectness' in losses and 'cues_semantic' in losses
    for k, val in losses.items():
        assert np.isfinite(float(val)), k
    # both matchers receive gradient
    assert float(jnp.abs(g['match_surf']['kernel']).max()) > 0
    assert float(jnp.abs(g['match_line']['kernel']).max()) > 0
    assert float(jnp.abs(g['cue_obj']['kernel']).max()) > 0


# compile-heavy: full tier only
pytestmark = pytest.mark.slow
