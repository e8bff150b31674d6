"""VoteNet + PointNet2 (static-shape indoor family)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.models.backbones.pointnet2 import (ball_group,
                                                farthest_point_sample)
from dfm_tpu.models.detectors.votenet import (VoteNet, VoteNetConfig,
                                              votenet_loss,
                                              votenet_predict)


def test_fps_spreads_points():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.rand(256, 3) * 4, jnp.float32)
    idx = farthest_point_sample(xyz, 16)
    assert len(np.unique(np.asarray(idx))) == 16
    # FPS min pairwise distance should beat random selection's
    sel = np.asarray(xyz)[np.asarray(idx)]
    rnd = np.asarray(xyz)[rng.choice(256, 16, replace=False)]

    def min_pair(a):
        d = np.linalg.norm(a[:, None] - a[None], axis=-1)
        return d[~np.eye(len(a), dtype=bool)].min()
    assert min_pair(sel) > min_pair(rnd) * 0.9


def test_ball_group_radius():
    xyz = jnp.asarray([[0, 0, 0], [0.1, 0, 0], [5, 5, 5]], jnp.float32)
    g = ball_group(xyz, None, xyz[:1], radius=0.5, k=4)
    # far point excluded: all relative coords within radius
    assert float(jnp.abs(g).max()) <= 0.5


@pytest.fixture(scope='module')
def tiny():
    cfg = VoteNetConfig(num_classes=4,
                        mean_sizes=tuple((0.8, 0.8, 0.9)
                                         for _ in range(4)),
                        num_proposals=16)
    model = VoteNet(cfg=cfg)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(1, 512, 3) * 4, jnp.float32)
    # small sa_points for the tiny cloud
    import dataclasses as dc
    model = VoteNet(cfg=cfg)
    object.__setattr__(model, 'backbone_cfg', None)
    v = model.init(jax.random.PRNGKey(0), pts)
    return cfg, model, v, pts


def test_votenet_forward_loss_predict(tiny):
    cfg, model, v, pts = tiny
    outs, _ = model.apply(v, pts, train=True,
                          mutable=['batch_stats'])
    assert outs['raw'].shape[1] == cfg.num_proposals
    batch = dict(
        gt_boxes=jnp.zeros((1, 4, 7)).at[0, 0].set(
            jnp.asarray([2.0, 2.0, 1.0, 0.8, 0.9, 0.9, 0.5])),
        gt_labels=jnp.zeros((1, 4), jnp.int32),
        gt_mask=jnp.zeros((1, 4), bool).at[0, 0].set(True))
    total, losses = votenet_loss(outs, batch, cfg)
    assert jnp.isfinite(total)
    for k, val in losses.items():
        assert jnp.isfinite(val), k
    det = votenet_predict(outs, cfg)
    assert det['boxes_3d'].shape == (1, cfg.num_proposals, 7)
    assert jnp.isfinite(det['boxes_3d']).all()
    assert (det['boxes_3d'][..., 3:6] > 0).all()
