"""Round-3 tail inventory: seg_eval, DGCNN, MinkResNet, NoStemRegNet,
MultiBackbone, FreeAnchor3D loss, ShapeAware head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.evaluation.seg_eval import fast_hist, seg_eval


def test_seg_eval_perfect_and_confused():
    label2cat = {0: 'wall', 1: 'floor', 2: 'chair'}
    gt = [np.array([0, 0, 1, 2, 2, 2])]
    ret = seg_eval(gt, [gt[0].copy()], label2cat)
    assert ret['miou'] == pytest.approx(1.0)
    assert ret['acc'] == pytest.approx(1.0)
    # one chair point mispredicted as floor
    pred = np.array([0, 0, 1, 2, 2, 1])
    ret = seg_eval(gt, [pred], label2cat)
    assert ret['chair'] == pytest.approx(2 / 3)
    assert ret['floor'] == pytest.approx(1 / 2)   # 1 TP, 1 FP
    assert ret['wall'] == pytest.approx(1.0)
    assert ret['acc'] == pytest.approx(5 / 6)


def test_seg_eval_ignore_index():
    label2cat = {0: 'a', 1: 'b'}
    gt = [np.array([0, 1, 255, 255])]
    pred = [np.array([0, 1, 0, 1])]   # ignored points mispredicted
    ret = seg_eval(gt, pred, label2cat, ignore_index=255)
    assert ret['miou'] == pytest.approx(1.0)


def test_fast_hist_matrix():
    h = fast_hist(np.array([0, 1, 1]), np.array([0, 0, 1]), 2)
    assert h.tolist() == [[1, 1], [0, 1]]


def test_knn_indices_exact():
    from dfm_tpu.models.backbones.dgcnn import knn_indices
    rng = np.random.RandomState(0)
    pts = rng.randn(64, 3).astype(np.float32)
    idx = np.asarray(knn_indices(jnp.asarray(pts), jnp.asarray(pts), 5))
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    ref = np.argsort(d2, axis=1)[:, :5]
    # same neighbor SETS (ordering may differ on ties)
    for i in range(64):
        assert set(idx[i].tolist()) == set(ref[i].tolist())


def test_dgcnn_backbone_shapes():
    from dfm_tpu.models.backbones.dgcnn import DGCNNBackbone
    m = DGCNNBackbone(in_channels=6, num_samples=(8, 8, 8),
                      gf_channels=((16, 16), (16, 16), (16,)),
                      fa_channels=(64,))
    pts = jnp.asarray(np.random.RandomState(0).randn(2, 128, 6),
                      jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), pts)
    out = m.apply(vs, pts)
    assert out['fa_points'].shape == (2, 128, 64 + 16 + 16 + 16)
    assert len(out['gf_points']) == 4
    assert np.isfinite(np.asarray(out['fa_points'])).all()


def _sparse_sample(rng, n=40, grid=(8, 8, 8), cap=64):
    from dfm_tpu.ops.sparse_conv import INVALID, flatten_key
    nz, ny, nx = grid
    coords = np.unique(
        rng.randint(0, 8, size=(n, 3)).astype(np.int64), axis=0)
    v = coords.shape[0]
    keys = np.asarray(flatten_key(coords[:, 0], coords[:, 1], coords[:, 2],
                                  grid))
    keys = np.sort(keys)
    pad = np.full(cap - v, int(INVALID), np.int64)
    keys = np.concatenate([keys, pad])
    mask = np.arange(cap) < v
    return jnp.asarray(keys, jnp.int32), jnp.asarray(mask), v


def test_mink_downsample_active_set():
    from dfm_tpu.ops.sparse_conv import unflatten_key
    from dfm_tpu.models.backbones.mink_resnet import (mink_downsample,
                                                      mink_out_grid)
    rng = np.random.RandomState(1)
    keys, mask, v = _sparse_sample(rng)
    ok, om, gat = mink_downsample(keys, mask, (8, 8, 8))
    og = mink_out_grid((8, 8, 8))
    z, y, x = (np.asarray(a) for a in unflatten_key(keys, (8, 8, 8)))
    got = {tuple(c) for c in np.stack(
        [np.asarray(a)[np.asarray(om)] for a in
         unflatten_key(ok, og)], axis=1)}
    want = {(zi // 2, yi // 2, xi // 2)
            for zi, yi, xi in zip(z[:v], y[:v], x[:v])}
    assert got == want
    # every gather slot points at a valid input or -1
    g = np.asarray(gat)
    assert ((g == -1) | ((g >= 0) & (g < keys.shape[0]))).all()


def test_mink_pool_matches_dense_maxpool():
    """k=2 s=2 pool gather tables must cover inputs {2o, 2o+1} per dim
    (ME even-kernel convention), i.e. pooled features equal a dense
    max-pool restricted to the active output set."""
    from dfm_tpu.ops.sparse_conv import unflatten_key
    from dfm_tpu.models.backbones.mink_resnet import (mink_downsample,
                                                      mink_out_grid)
    rng = np.random.RandomState(3)
    grid = (8, 8, 8)
    keys, mask, v = _sparse_sample(rng, n=50, grid=grid)
    feats = rng.randn(keys.shape[0], 4).astype(np.float32)

    ok, om, gat = mink_downsample(keys, mask, grid, kernel=(2, 2, 2))
    og = mink_out_grid(grid)
    # every active output gathers at least one valid tap
    g = np.asarray(gat)
    assert (g[:, np.asarray(om)] >= 0).any(axis=0).all()

    # dense oracle
    dense = np.full(grid + (4,), -np.inf, np.float32)
    z, y, x = (np.asarray(a) for a in unflatten_key(keys, grid))
    for i in range(v):
        dense[z[i], y[i], x[i]] = feats[i]
    want = np.full(og + (4,), -np.inf, np.float32)
    for zo in range(og[0]):
        for yo in range(og[1]):
            for xo in range(og[2]):
                blk = dense[2 * zo:2 * zo + 2, 2 * yo:2 * yo + 2,
                            2 * xo:2 * xo + 2]
                want[zo, yo, xo] = blk.reshape(-1, 4).max(axis=0)

    pooled = np.full((keys.shape[0], 4), -np.inf, np.float32)
    fz = np.concatenate([feats, np.full((1, 4), -np.inf, np.float32)])
    for k in range(g.shape[0]):
        idx = np.where(g[k] >= 0, g[k], keys.shape[0])
        pooled = np.maximum(pooled, fz[idx])
    zo, yo, xo = (np.asarray(a) for a in unflatten_key(ok, og))
    omn = np.asarray(om)
    np.testing.assert_allclose(pooled[omn], want[zo[omn], yo[omn], xo[omn]])


def test_mink_resnet_forward():
    from dfm_tpu.models.backbones.mink_resnet import MinkResNet
    rng = np.random.RandomState(2)
    keys, mask, v = _sparse_sample(rng, n=60, grid=(16, 16, 16), cap=128)
    keys = keys[None]
    mask = mask[None]
    feats = jnp.asarray(rng.randn(1, 128, 3), jnp.float32)
    m = MinkResNet(depth=18, in_channels=3, num_stages=2,
                   base_channels=8)
    vs = m.init(jax.random.PRNGKey(0), keys, feats, mask, (16, 16, 16))
    outs = m.apply(vs, keys, feats, mask, (16, 16, 16),
                   mutable=['batch_stats'])[0]
    assert len(outs) == 2
    k0, m0, g0, f0 = outs[0]
    k1, m1, g1, f1 = outs[1]
    assert f0.shape[-1] == 8 and f1.shape[-1] == 16
    # stem s2 + pool s2 + stage0 s2 + stage1 s2 = /16 -> 1^3 grid
    assert g1 == (1, 1, 1)
    assert np.isfinite(np.asarray(f1)).all()
    # dead slots carry zeros
    assert np.abs(np.asarray(f0)[~np.asarray(m0)]).max() == 0.0


def test_regnet_widths_400mf():
    from dfm_tpu.models.backbones.nostem_regnet import (_adjust_widths,
                                                        generate_regnet)
    widths, depths = generate_regnet(24, 24.48, 2.54, 22)
    widths, groups = _adjust_widths(widths, 16, 1.0)
    # pycls RegNetX-400MF: w = (32, 64, 160, 384), d = (1, 2, 7, 12)
    assert widths == (32, 64, 160, 384)
    assert depths == (1, 2, 7, 12)
    assert groups == (16, 16, 16, 16)


def test_nostem_regnet_forward():
    from dfm_tpu.models.backbones.nostem_regnet import NoStemRegNet
    m = NoStemRegNet(arch=dict(w0=24, wa=24.48, wm=2.54, group_w=16,
                               depth=4, bot_mul=1.0))
    x = jnp.ones((1, 16, 16, 64))
    vs = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vs, x, mutable=['batch_stats'])[0]
    assert len(outs) == len(
        set(outs[i].shape for i in range(len(outs))))  # strides differ
    assert outs[0].shape[1] == 16   # first stage stride 1
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_multi_backbone_aggregation():
    from dfm_tpu.models.backbones.multi_backbone import MultiBackbone
    m = MultiBackbone(
        num_streams=2, suffixes=('net0', 'net1'),
        sa_points=(64, 32), sa_radii=(0.2, 0.4), sa_ks=(8, 8),
        sa_mlps=((8, 8), (8, 16)), fp_channels=((16,),))
    pts = jnp.asarray(np.random.RandomState(0).randn(1, 256, 4),
                      jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), pts)
    out = m.apply(vs, pts, mutable=['batch_stats'])[0]
    assert 'fp_features_net0' in out and 'fp_features_net1' in out
    # agg MLP default tail: sum // num_streams channels
    assert out['hd_feature'].shape[-1] == (16 + 16) // 2
    assert np.isfinite(np.asarray(out['hd_feature'])).all()


def _anchor_grid(ny=4, nx=4, na=2):
    ys, xs = np.meshgrid(np.arange(ny) + 0.5, np.arange(nx) + 0.5,
                         indexing='ij')
    base = np.stack([xs.ravel(), ys.ravel(), np.zeros(ny * nx)], axis=1)
    anchors = []
    for r in (0.0, np.pi / 2)[:na]:
        a = np.concatenate(
            [base, np.tile([1.6, 3.9, 1.5, r], (ny * nx, 1))], axis=1)
        anchors.append(a)
    return np.stack(anchors, 1).reshape(-1, 7).astype(np.float32)


def test_free_anchor_loss_finite_and_ordering():
    from dfm_tpu.models.heads.free_anchor3d import free_anchor3d_loss
    rng = np.random.RandomState(0)
    ny = nx = 4
    na = 2
    j = ny * nx * na
    anchors = jnp.asarray(_anchor_grid(ny, nx, na))
    gt = np.zeros((1, 3, 7), np.float32)
    gt[0, 0] = [2.5, 2.5, 0, 1.6, 3.9, 1.5, 0.1]
    gt_boxes = jnp.asarray(gt)
    gt_labels = jnp.zeros((1, 3), jnp.int32)
    gt_mask = jnp.asarray([[True, False, False]])

    def mk_preds(scale):
        cls = jnp.asarray(rng.randn(1, ny, nx, na * 3) * scale,
                          jnp.float32)
        reg = jnp.asarray(rng.randn(1, ny, nx, na * 7) * scale * 0.1,
                          jnp.float32)
        d = jnp.asarray(rng.randn(1, ny, nx, na * 2) * scale, jnp.float32)
        return cls, reg, d

    losses = free_anchor3d_loss(mk_preds(1.0), anchors, gt_boxes,
                                gt_labels, gt_mask, pre_anchor_topk=6)
    for v in losses.values():
        assert np.isfinite(float(v))
        assert float(v) >= 0

    # gradient w.r.t. predictions is finite
    def total(preds):
        ls = free_anchor3d_loss(preds, anchors, gt_boxes, gt_labels,
                                gt_mask, pre_anchor_topk=6)
        return ls['positive_bag_loss'] + ls['negative_bag_loss']
    g = jax.grad(total)(mk_preds(1.0))
    for t in g:
        assert np.isfinite(np.asarray(t)).all()

    # all-invalid GTs: finite, positive bag contributes zero
    ls0 = free_anchor3d_loss(
        mk_preds(1.0), anchors, gt_boxes, gt_labels,
        jnp.zeros((1, 3), bool), pre_anchor_topk=6)
    assert float(ls0['positive_bag_loss']) == 0.0
    assert np.isfinite(float(ls0['negative_bag_loss']))


def test_shape_aware_head_forward_loss_decode():
    from dfm_tpu.models.heads.shape_aware import (ShapeAwareHead,
                                                  shape_aware_get_bboxes,
                                                  shape_aware_loss)
    tasks = [
        dict(num_class=1, num_base_anchors=2,
             shared_conv_channels=(16, 16), shared_conv_strides=(1, 1)),
        # 2 classes x 2 rotations share this branch: its flat block is
        # anchor-major, so each class owns a contiguous R*H*W segment
        dict(num_class=2, num_base_anchors=4,
             shared_conv_channels=(16, 16), shared_conv_strides=(2, 1)),
    ]
    m = ShapeAwareHead(tasks=tasks, num_classes=3)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8),
                    jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), x)
    cls, reg, dirp, sizes = m.apply(vs, x, mutable=['batch_stats'])[0]
    j0 = 2 * 8 * 8          # task0: full res
    j1 = 4 * 4 * 4          # task1: stride 2, 4 base anchors
    assert cls.shape == (1, j0 + j1, 3)
    assert reg.shape == (1, j0 + j1, 7)
    assert sizes == [(8, 8), (4, 4), (4, 4)]

    anchors_pc = [jnp.asarray(_anchor_grid(8, 8, 2)),
                  jnp.asarray(_anchor_grid(4, 4, 2)),
                  jnp.asarray(_anchor_grid(4, 4, 2))]
    gt = np.zeros((1, 2, 7), np.float32)
    gt[0, 0] = [2.5, 2.5, 0, 1.6, 3.9, 1.5, 0.0]
    cfgs = [dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.3)] * 3
    losses = shape_aware_loss(
        (cls, reg, dirp), anchors_pc, jnp.asarray(gt),
        jnp.zeros((1, 2), jnp.int32), jnp.asarray([[True, False]]), cfgs)
    assert set(losses) == {'loss_cls', 'loss_bbox', 'loss_dir'}
    for v in losses.values():
        assert np.isfinite(float(v))

    flat = jnp.concatenate(anchors_pc, axis=0)
    det = shape_aware_get_bboxes((cls, reg, dirp), flat, nms_pre=32,
                                 max_num=8)
    assert det['boxes3d'].shape == (1, 8, 7)
    assert np.isfinite(np.asarray(det['boxes3d'])).all()


def test_export_scene_html(tmp_path):
    from dfm_tpu.visualization.html_vis import export_scene_html
    rng = np.random.RandomState(0)
    pts = rng.randn(500, 4).astype(np.float32) * 5
    gt = np.array([[0, 0, 0, 2, 4, 1.5, 0.3]], np.float32)
    pred = np.array([[1, 1, 0, 2, 4, 1.5, -0.2],
                     [5, 2, 0, 1, 1, 2, 0.0]], np.float32)
    out = export_scene_html(pts, str(tmp_path / 'scene.html'),
                            gt_boxes=gt, pred_boxes=pred)
    html = open(out).read()
    assert html.startswith('<!DOCTYPE html>')
    assert 'webgl' in html and 'DATA' in html
    import json as _json
    import re
    blob = re.search(r'const DATA = (\{.*?\});\n', html, re.S).group(1)
    data = _json.loads(blob)
    assert len(data['pts']) == 500 * 3
    # 3 boxes x 12 edges x 2 endpoints x 3 coords
    assert len(data['lines']) == 3 * 12 * 2 * 3
    assert len(data['lineCol']) == len(data['lines'])


def test_backbone_registry_builds_all_types():
    """Every backbone is constructible by type name (reference
    BACKBONES registry, models/builder.py:16)."""
    from dfm_tpu.models.builder import backbone_types, build_backbone
    names = backbone_types()
    assert {'MinkResNet', 'DGCNNBackbone', 'NoStemRegNet',
            'MultiBackbone', 'PointNet2SAMSG'} <= set(names)
    for name in names:
        kw = {'MinkResNet': dict(depth=14)}.get(name, {})
        m = build_backbone(dict(type=name, **kw))
        assert type(m).__name__ == name
