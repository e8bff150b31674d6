"""ImVoteNet: vote fusion cues + three-tower train/predict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.models.detectors.imvotenet import (ImVoteNet,
                                                ImVoteNetConfig,
                                                imvotenet_loss,
                                                imvotenet_predict,
                                                vote_fusion_cues)


def _d2i(h, w, f=50.0):
    """Depth frame (x right, y forward, z up) -> image projection."""
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = k[1, 1] = f
    k[0, 2] = w / 2
    k[1, 2] = h / 2
    swap = np.array([[1, 0, 0, 0], [0, 0, -1, 0],
                     [0, 1, 0, 0], [0, 0, 0, 1]], np.float32)
    return k @ swap


def test_vote_fusion_cues_geometry():
    h, w = 48, 64
    d2i = _d2i(h, w)
    # one seed straight ahead at depth 5 (depth frame: x right,
    # y forward/depth axis per projection below; use a point that
    # projects to the image center)
    seed = np.array([[0.0, 5.0, 0.0]], np.float32)   # 5 m ahead
    proj = d2i @ np.array([0, 5, 0, 1.0], np.float32)
    u, v = proj[0] / proj[2], proj[1] / proj[2]
    # a 2D box centered exactly on the seed's pixel -> delta uv = 0
    box = np.array([[u - 5, v - 5, u + 5, v + 5, 0.9, 2],
                    [0, 0, 0, 0, 0, 0]], np.float32)   # + pad slot
    img = np.full((h, w, 3), 128, np.float32)
    cues, txt, mask = vote_fusion_cues(
        jnp.asarray(seed), jnp.asarray(box), jnp.asarray(img),
        jnp.asarray(d2i), num_classes=10, max_per=2)
    assert bool(mask[0, 0])
    assert not bool(mask[0, 1])            # only one box
    # semantic cue: confidence at class 2
    assert abs(float(cues[0, 0, 5 + 2]) - 0.9) < 1e-6
    assert abs(float(cues[0, 0, 5 + 3])) < 1e-9
    # centered box -> zero xz displacement cue
    assert abs(float(cues[0, 0, 0])) < 1e-4
    assert abs(float(cues[0, 0, 1])) < 1e-4
    # texture cue = normalized pixel
    assert abs(float(txt[0, 0]) - 128 / 255) < 1e-6
    # seed outside every box -> masked zero cues
    far = np.array([[10.0, 5.0, 3.0]], np.float32)
    cues2, _, mask2 = vote_fusion_cues(
        jnp.asarray(far), jnp.asarray(box), jnp.asarray(img),
        jnp.asarray(d2i), num_classes=10, max_per=2)
    assert not bool(mask2.any())
    assert float(jnp.abs(cues2).max()) == 0.0


@pytest.fixture(scope='module')
def tiny():
    cfg = ImVoteNetConfig(num_classes=4,
                          mean_sizes=tuple((0.8, 0.8, 0.9)
                                           for _ in range(4)),
                          num_proposals=16)
    model = ImVoteNet(cfg=cfg)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(1, 256, 3) * 4, jnp.float32)
    img = jnp.asarray(rng.randint(0, 255, (1, 32, 48, 3)), jnp.float32)
    bb = np.zeros((1, 4, 6), np.float32)
    bb[0, :2] = [[5, 5, 25, 25, 0.8, 1], [10, 10, 40, 30, 0.6, 3]]
    bb = jnp.asarray(bb)
    d2i = jnp.asarray(_d2i(32, 48))[None]
    v = model.init(jax.random.PRNGKey(0), pts, img, bb, d2i, train=True)
    return cfg, model, v, (pts, img, bb, d2i)


def test_imvotenet_towers_and_loss(tiny):
    cfg, model, v, args = tiny
    outs, _ = model.apply(v, *args, train=True, mutable=['batch_stats'])
    assert set(outs) == {'joint', 'pts', 'img'}
    batch = dict(
        gt_boxes=jnp.asarray([[[2.0, 2.0, 1.0, 0.8, 0.8, 0.9, 0.3],
                               [3.0, 1.0, 1.0, 0.8, 0.8, 0.9, 0.0]]]),
        gt_labels=jnp.asarray([[1, 3]]),
        gt_mask=jnp.asarray([[True, True]]))
    total, losses = imvotenet_loss(outs, batch, cfg)
    assert np.isfinite(float(total))
    assert any(k.startswith('joint_') for k in losses)
    assert any(k.startswith('img_') for k in losses)

    def loss_fn(params):
        o, _ = model.apply({'params': params,
                            'batch_stats': v['batch_stats']},
                           *args, train=True, mutable=['batch_stats'])
        return imvotenet_loss(o, batch, cfg)[0]

    g = jax.grad(loss_fn)(v['params'])
    gn = jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                      for x in jax.tree_util.tree_leaves(g)))
    assert np.isfinite(float(gn)) and float(gn) > 0
    # image tower gradients flow into the fusion MLP
    assert float(jnp.abs(g['img_mlp']['kernel']).max()) > 0


def test_imvotenet_predict(tiny):
    cfg, model, v, args = tiny
    outs = model.apply(v, *args, train=False)
    det = imvotenet_predict(outs, cfg)
    assert det['boxes_3d'].shape == (1, 16, 7)
    for x in jax.tree_util.tree_leaves(det):
        assert np.isfinite(np.asarray(x, np.float32)).all()


def test_imvotenet_img_branch_modes():
    """In-graph 2D branch (reference joint structure): frozen stage-2
    mode passes no gradient into the img backbone; trainable stage-1
    mode adds the ATSS 2D losses and does."""
    import dataclasses as dc
    rng = np.random.RandomState(2)
    base = ImVoteNetConfig(
        num_classes=4,
        mean_sizes=tuple((0.8, 0.8, 0.9) for _ in range(4)),
        num_proposals=16, with_img_branch=True,
        img_backbone_depth=18, img_max_boxes=8)
    pts = jnp.asarray(rng.rand(1, 256, 3) * 4, jnp.float32)
    img = jnp.asarray(rng.randint(0, 255, (1, 64, 96, 3)), jnp.float32)
    bb = jnp.zeros((1, 8, 6), jnp.float32)      # ignored in this mode
    d2i = jnp.asarray(np.eye(4, dtype=np.float32))[None]
    batch3d = dict(
        gt_boxes=jnp.asarray([[[2.0, 2.0, 1.0, 0.8, 0.8, 0.9, 0.3]]]),
        gt_labels=jnp.asarray([[1]]),
        gt_mask=jnp.asarray([[True]]))

    # frozen (stage-2, the shipped config)
    m = ImVoteNet(cfg=base)
    v = m.init(jax.random.PRNGKey(0), pts, img, bb, d2i, train=True)
    outs, _ = m.apply(v, pts, img, bb, d2i, train=True,
                      mutable=['batch_stats'])
    assert 'outs_2d' not in outs

    def loss_frozen(params):
        o, _ = m.apply({'params': params,
                        'batch_stats': v['batch_stats']},
                       pts, img, bb, d2i, train=True,
                       mutable=['batch_stats'])
        return imvotenet_loss(o, batch3d, base)[0]

    g = jax.grad(loss_frozen)(v['params'])
    img_g = max(float(jnp.abs(x).max()) for x in
                jax.tree_util.tree_leaves(g['img_backbone']))
    assert img_g == 0.0                        # frozen branch
    assert float(jnp.abs(g['img_mlp']['kernel']).max()) > 0

    # trainable (stage-1 joint): 2D losses + img-branch gradients
    cfg1 = dc.replace(base, freeze_img_branch=False)
    m1 = ImVoteNet(cfg=cfg1)
    outs1, _ = m1.apply(v, pts, img, bb, d2i, train=True,
                        mutable=['batch_stats'])
    assert 'outs_2d' in outs1
    batch1 = dict(batch3d,
                  gt_bboxes2d=jnp.asarray([[[10., 8., 40., 30.]]]),
                  centers2d=jnp.asarray([[[25., 19.]]]),
                  img_hw=(64, 96))
    total, losses = imvotenet_loss(outs1, batch1, cfg1)
    assert 'loss_cls2d' in losses and np.isfinite(float(total))

    def loss_joint(params):
        o, _ = m1.apply({'params': params,
                         'batch_stats': v['batch_stats']},
                        pts, img, bb, d2i, train=True,
                        mutable=['batch_stats'])
        return imvotenet_loss(o, batch1, cfg1)[0]

    g1 = jax.grad(loss_joint)(v['params'])
    img_g1 = max(float(jnp.abs(x).max()) for x in
                 jax.tree_util.tree_leaves(g1['img_backbone']))
    assert img_g1 > 0.0


# compile-heavy: full tier only
pytestmark = pytest.mark.slow
