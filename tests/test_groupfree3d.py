"""Group-Free 3D: FP interpolation, KPS sampling, decoder stages,
loss/predict.

Reference surfaces: PointNet2SASSG fp_channels
(mmdet3d/models/backbones/pointnet2_sa_ssg.py), GroupFree3DHead KPS +
transformer decoder + per-stage losses
(mmdet3d/models/dense_heads/groupfree3d_head.py:299-537).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dfm_tpu.models.backbones.pointnet2 import three_interpolate
from dfm_tpu.models.detectors.groupfree3d import (GroupFree3DConfig,
                                                  GroupFree3DNet,
                                                  groupfree3d_loss,
                                                  groupfree3d_predict)


def _tiny_cfg():
    return GroupFree3DConfig(
        num_classes=4, num_proposal=16, num_decoder_layers=2,
        embed_dims=32, num_heads=4, ffn_channels=64,
        mean_sizes=tuple((0.8, 0.8, 0.9) for _ in range(4)),
        sa_points=(64, 32, 16, 8), sa_radii=(0.2, 0.4, 0.8, 1.2),
        sa_ks=(8, 8, 8, 8),
        sa_mlps=((8, 16), (16, 32), (16, 32), (16, 32)),
        fp_channels=((32, 32), (32, 32)), max_num=16)


def test_three_interpolate_exact_at_sources():
    """A destination point sitting exactly on a source point recovers
    that source's feature (inverse-distance weights -> delta)."""
    src_xyz = jnp.asarray([[[0, 0, 0], [5, 0, 0], [0, 5, 0]]],
                          jnp.float32)
    src_f = jnp.asarray([[[1.0], [2.0], [3.0]]])
    out = three_interpolate(src_xyz, src_f, src_xyz)
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], [1, 2, 3],
                               atol=1e-4)


def test_forward_stages_and_shapes():
    cfg = _tiny_cfg()
    model = GroupFree3DNet(cfg=cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.random((2, 128, 3), dtype=np.float32) * 6)
    v = model.init(jax.random.PRNGKey(0), pts, train=False)
    out = model.apply(v, pts, train=False)
    # proposal stage + num_decoder_layers refinement stages
    assert len(out['stages']) == cfg.num_decoder_layers + 1
    p = cfg.num_proposal
    for st in out['stages']:
        assert st['center'].shape == (2, p, 3)
        assert st['sem_scores'].shape == (2, p, cfg.num_classes)
        assert st['size_res_norm'].shape == (2, p, cfg.num_classes, 3)
    assert out['seeds_obj_cls_logits'].shape[1] == 32  # FP level seeds


def test_loss_and_grads():
    cfg = _tiny_cfg()
    model = GroupFree3DNet(cfg=cfg)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.random((1, 128, 3), dtype=np.float32) * 6)
    v = model.init(jax.random.PRNGKey(0), pts, train=False)
    gt = jnp.asarray([[[3, 3, 0.5, 1, 1, 1, 0],
                       [1, 1, 0.2, 0.8, 0.8, 0.8, 0]]], jnp.float32)
    batch = dict(points=pts, gt_boxes=gt,
                 gt_labels=jnp.asarray([[0, 2]], jnp.int32),
                 gt_mask=jnp.ones((1, 2), bool))

    def f(params):
        out, _ = model.apply(
            {'params': params, 'batch_stats': v['batch_stats']},
            pts, train=True, mutable=['batch_stats'])
        return groupfree3d_loss(out, batch, cfg)[0]

    total, grads = jax.value_and_grad(f)(v['params'])
    assert np.isfinite(float(total))
    gmax = max(float(jnp.abs(g).max())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gmax) and gmax > 0
    # per-stage loss terms exist for proposal and both decoder stages
    out = model.apply(v, pts, train=False)
    _, losses = groupfree3d_loss(out, batch, cfg)
    assert 'loss_sampling_obj' in losses
    for tag in ('proposal', 's0', 's1'):
        assert f'loss_{tag}_center' in losses


def test_predict_last_stage():
    cfg = _tiny_cfg()
    model = GroupFree3DNet(cfg=cfg)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.random((1, 128, 3), dtype=np.float32) * 6)
    v = model.init(jax.random.PRNGKey(0), pts, train=False)
    out = model.apply(v, pts, train=False)
    det = groupfree3d_predict(out, cfg)
    assert det['boxes_3d'].shape == (1, cfg.num_proposal, 7)
    assert np.isfinite(np.asarray(det['boxes_3d'])).all()
    # axis-aligned: yaw all zero
    assert np.all(np.asarray(det['boxes_3d'])[..., 6] == 0)


def test_config_builds():
    from dfm_tpu.models import build_detector
    from dfm_tpu.runtime.config import load_config
    cfg = load_config(os.path.join(os.path.dirname(__file__), '..',
                                   'configs', 'groupfree3d_scannet.py'))
    h = build_detector(cfg.model.to_dict())
    assert h.type == 'GroupFree3DNet'
    assert h.cfg.num_decoder_layers == 6
