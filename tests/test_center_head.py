"""CenterHead (CenterPoint) + circle NMS + ImVoxelNet tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dfm_tpu.models.heads.center_head import (
    CenterHead, CenterHeadConfig, center_head_decode, center_head_loss,
    center_head_targets, circle_nms_mask, gaussian_radius)

CFG = CenterHeadConfig(
    tasks=(('Car',), ('Pedestrian', 'Cyclist')),
    voxel_size=(0.5, 0.5), pc_range=(0.0, -8.0), max_objs=8,
    max_per_task=10, circle_nms_thr=1.0, score_thr=0.05)
TASK_IDS = ((0,), (1, 2))
NY, NX = 32, 40


def _gt():
    boxes = np.zeros((1, 3, 7), np.float32)
    boxes[0, 0] = [10.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.3]    # Car
    boxes[0, 1] = [5.0, 3.0, -1.2, 0.8, 0.6, 1.7, 0.0]     # Ped
    boxes[0, 2] = [15.0, -5.0, -1.1, 1.8, 0.8, 1.7, -0.5]  # Cyc
    labels = np.array([[0, 1, 2]], np.int64)
    mask = np.ones((1, 3), bool)
    return dict(gt_boxes=jnp.asarray(boxes), gt_labels=jnp.asarray(labels),
                gt_mask=jnp.asarray(mask))


def test_targets_peak_at_center():
    b = _gt()
    hm, anno, inds, mask = center_head_targets(
        b['gt_boxes'][0], b['gt_labels'][0], b['gt_mask'][0],
        TASK_IDS[0], (NY, NX), CFG)
    assert hm.shape == (NY, NX, 1)
    # car center: x=10 -> xi=20; y=0 -> yi=(0-(-8))/0.5=16
    assert float(hm[16, 20, 0]) == pytest.approx(1.0)
    assert float(hm.max()) == pytest.approx(1.0)
    assert int(mask.sum()) == 1
    assert int(inds[0]) == 16 * NX + 20
    # sub-pixel offsets and log-dims encoded
    assert np.allclose(np.asarray(anno[0, 3:6]),
                       np.log([4.0, 2.0, 1.5]), atol=1e-5)


def test_gaussian_radius_positive():
    r = gaussian_radius(jnp.asarray([[10.0, 6.0]]), 0.1)
    assert float(r[0]) > 0


def test_circle_nms():
    centers = jnp.asarray([[0.0, 0.0], [0.5, 0.0], [5.0, 5.0]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(circle_nms_mask(centers, scores, thresh=1.0))
    assert keep.tolist() == [True, False, True]


def test_loss_and_grad():
    model = CenterHead(cfg=CFG)
    bev = jnp.asarray(np.random.RandomState(0)
                      .randn(1, NY, NX, 16).astype(np.float32))
    var = model.init(jax.random.PRNGKey(0), bev)
    outs = model.apply(var, bev)
    assert len(outs) == 2
    assert outs[0]['heatmap'].shape == (1, NY, NX, 1)
    assert outs[1]['heatmap'].shape == (1, NY, NX, 2)
    batch = _gt()
    losses = center_head_loss(outs, batch, CFG, TASK_IDS)
    assert all(np.isfinite(float(v)) for v in losses.values())

    def f(v):
        o = model.apply(v, bev)
        return sum(center_head_loss(o, batch, CFG, TASK_IDS).values())
    g = jax.grad(f)(var)
    leaves = jax.tree_util.tree_leaves(g['params'])
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(float(jnp.abs(x).sum()) > 0 for x in leaves)


def test_decode_recovers_encoded_box():
    """Hand-build head outputs encoding one box -> decode recovers it."""
    box = np.array([10.2, 0.3, -1.0, 4.0, 2.0, 1.5, 0.4], np.float32)
    xi, yi = 20, 16
    hm = np.full((1, NY, NX, 1), -8.0, np.float32)        # sigmoid ~ 0
    hm[0, yi, xi, 0] = 8.0                                # sigmoid ~ 1
    reg = np.zeros((1, NY, NX, 2), np.float32)
    reg[0, yi, xi] = [(10.2 / 0.5) - xi, ((0.3 + 8) / 0.5) - yi]
    height = np.full((1, NY, NX, 1), box[2], np.float32)
    dim = np.tile(np.log(box[3:6])[None, None, None], (1, NY, NX, 1))
    rot = np.zeros((1, NY, NX, 2), np.float32)
    rot[..., 0] = np.sin(box[6])
    rot[..., 1] = np.cos(box[6])
    task0 = dict(heatmap=jnp.asarray(hm), reg=jnp.asarray(reg),
                 height=jnp.asarray(height), dim=jnp.asarray(dim),
                 rot=jnp.asarray(rot))
    task1 = dict(heatmap=jnp.full((1, NY, NX, 2), -8.0),
                 reg=jnp.asarray(reg), height=jnp.asarray(height),
                 dim=jnp.asarray(dim), rot=jnp.asarray(rot))
    det = center_head_decode([task0, task1], CFG, TASK_IDS)
    s = np.asarray(det['scores_3d'])
    top = int(np.argmax(s))
    assert s[top] > 0.9
    np.testing.assert_allclose(np.asarray(det['boxes_3d'][top]), box,
                               atol=1e-2)
    assert int(det['labels_3d'][top]) == 0


def test_imvoxelnet_forward_loss_predict():
    from dfm_tpu.models.detectors.imvoxelnet import (
        ImVoxelNet, ImVoxelNetConfig, imvoxelnet_loss, imvoxelnet_predict)
    cfg = ImVoxelNetConfig(
        voxel_range=(0, -8, -2, 16, 8, 2), voxel_grid=(4, 16, 16),
        anchor_ranges=((0, -8, -1.0, 16, 8, -1.0),),
        backbone_depth=50, nms_pre=64, max_num=8, feat_channels=16)
    model = ImVoxelNet(cfg=cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32))
    K = np.array([[30, 0, 24, 0], [0, 30, 16, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float32)
    rot = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                    [0, 0, 0, 1]], np.float32)
    l2i = jnp.asarray((K @ rot)[None])
    var = model.init(jax.random.PRNGKey(0), img, l2i, (32, 48))
    outs = model.apply(var, img, l2i, (32, 48))
    assert float(jnp.abs(outs['volume_feat']).sum()) > 0

    gen = cfg.anchor_generator()
    nz, ny, nx = cfg.voxel_grid
    grid = gen.grid_anchors((ny, nx))
    a = grid[0, ny // 2, nx // 2, 0, 0]
    gt = np.concatenate([a[:6], [0.0]]).astype(np.float32)
    batch = dict(gt_boxes=jnp.asarray(gt)[None, None],
                 gt_labels=jnp.zeros((1, 1), jnp.int32),
                 gt_mask=jnp.ones((1, 1), bool))
    total, losses = imvoxelnet_loss(outs, batch, cfg)
    assert np.isfinite(float(total))
    det = imvoxelnet_predict(outs, cfg)
    assert det['boxes3d'].shape[-1] == 7


def test_mv_center_head_branch():
    from dfm_tpu.models import MVDfMConfig, MultiViewDfM, mvdfm_loss, \
        mvdfm_predict
    cfg = MVDfMConfig(
        num_views=2, num_frames=1, feat_channels=16, bbox_head='center',
        voxel_range=(-8, -8, -1, 8, 8, 3), voxel_grid=(4, 16, 16),
        anchor_ranges=((-8, -8, 0.0, 8, 8, 0.0),) * 3,
        backbone_depth=50, nms_pre=64, max_num=8)
    model = MultiViewDfM(cfg=cfg)
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randn(1, 1, 2, 32, 48, 3).astype(np.float32))
    l2i = np.zeros((1, 1, 2, 4, 4), np.float32)
    for v in range(2):
        ang = np.pi * v
        c, s = np.cos(ang), np.sin(ang)
        rotm = np.array([[-s, c, 0, 0], [0, 0, -1, 0],
                         [c, s, 0, 0], [0, 0, 0, 1]], np.float32)
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 30.0
        K[0, 2], K[1, 2] = 24, 16
        l2i[0, 0, v] = K @ rotm
    l2i = jnp.asarray(l2i)
    var = model.init(jax.random.PRNGKey(0), imgs, l2i, (32, 48))
    outs = model.apply(var, imgs, l2i, (32, 48))
    assert 'task_outs' in outs and len(outs['task_outs']) == 2
    batch = dict(
        gt_boxes=jnp.asarray([[[2.0, 1.0, 0.0, 3.9, 1.6, 1.5, 0.2]]]),
        gt_labels=jnp.zeros((1, 1), jnp.int32),
        gt_mask=jnp.ones((1, 1), bool))
    total, losses = mvdfm_loss(outs, batch, cfg)
    assert np.isfinite(float(total))
    det = mvdfm_predict(outs, cfg)
    assert det['boxes_3d'].shape[-1] == 7
