"""Every shipped config builds a detector through the registry.

Mirrors the reference's config-zoo coverage (configs/dfm, pgd, fcos3d,
imvoxelnet, second): each file must load through `_base_` resolution
and its `model` dict must construct via `build_detector` (validating
that every config key maps onto the detector's Config dataclass).
Small-scale forward/loss coverage for each detector family lives in
the per-model test files; here the LiDAR family additionally runs a
tiny end-to-end forward (cheap enough on CPU).
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.models import build_detector, detector_types
from dfm_tpu.runtime.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), '..', 'configs')
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, '*.py')))


def test_zoo_is_at_reference_scale():
    # reference zoo: dfm(6) + pgd(9) + fcos3d(2) + imvoxelnet(1) +
    # second(5); ours must not regress below the families we claim
    assert len(CONFIGS) >= 15


@pytest.mark.parametrize('path', CONFIGS, ids=os.path.basename)
def test_config_builds(path):
    cfg = load_config(path)
    handle = build_detector(cfg.model.to_dict())
    assert handle.type in detector_types()
    assert handle.module is not None
    assert callable(handle.loss_fn) and callable(handle.predict_fn)


def test_voxelnet_family_tiny_forward():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.rand(1, 256, 3) * 8.0, jnp.float32)
    mask = jnp.ones((1, 256), bool)
    mc = dict(type='VoxelNet', num_classes=1,
              point_cloud_range=(0, -4, -3, 8, 4, 1),
              voxel_size=(0.5, 0.5, 0.5),
              max_points_per_voxel=5,
              anchor_ranges=((0, -4, -1.78, 8, 4, -1.78),),
              anchor_sizes=((3.9, 1.6, 1.56),),
              assigner_cfgs=(
                  dict(pos_iou_thr=0.6, neg_iou_thr=0.45,
                       min_pos_iou=0.45),))
    h = build_detector(mc)
    # points span y in [0, 8) but pcr y is [-4, 4): shift into range
    pts = pts - jnp.asarray([0.0, 4.0, 3.0])
    v = h.module.init(jax.random.PRNGKey(0), pts, mask)
    out = h.module.apply(v, pts, mask)
    assert out['cls_score'].ndim == 4
    assert jnp.isfinite(out['bbox_pred']).all()


def test_centerpoint_tiny_forward_loss():
    from dfm_tpu.models import centerpoint_loss, centerpoint_predict
    rng = np.random.RandomState(1)
    mc = dict(type='CenterPoint',
              point_cloud_range=(0.0, -4.0, -3.0, 8.0, 4.0, 1.0),
              voxel_size=(0.5, 0.5, 1.0),
              encoder_channels=8,
              second_channels=(8, 16), second_layers=(1, 1),
              second_strides=(1, 2), fpn_channels=(16, 16),
              fpn_strides=(1, 2),
              head=dict(share_conv_channel=8, head_conv=8, max_objs=8,
                        voxel_size=(0.5, 0.5), pc_range=(0.0, -4.0),
                        max_per_task=8))
    h = build_detector(mc)
    pts = jnp.asarray(rng.rand(1, 128, 3), jnp.float32) * \
        jnp.asarray([8.0, 8.0, 4.0]) - jnp.asarray([0.0, 4.0, 3.0])
    mask = jnp.ones((1, 128), bool)
    v = h.module.init(jax.random.PRNGKey(0), pts, mask)
    outs = h.module.apply(v, pts, mask)
    assert len(outs) == h.cfg.head.num_tasks

    batch = dict(
        gt_boxes=jnp.asarray([[[4.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.3],
                               [2.0, 1.0, -1.0, 0.8, 0.6, 1.7, 0.0]]]),
        gt_labels=jnp.asarray([[0, 1]]),
        gt_mask=jnp.asarray([[True, True]]))
    losses = h.loss_fn(outs, batch, h.cfg)
    for k, val in losses.items():
        assert jnp.isfinite(val), k
    det = h.predict_fn(outs, h.cfg)
    assert det['boxes_3d'].shape[-1] == 7
    assert jnp.isfinite(det['scores_3d']).all()


def test_dynamic_vs_hard_voxelization_differ():
    """Cap actually drops points: voxel mean over capped arrival-order
    subset differs from the dynamic all-points mean."""
    from dfm_tpu.models.detectors.teacher import voxelize_mean
    pts = jnp.asarray([[0.1, 0.1, 0.1],
                       [0.2, 0.2, 0.2],
                       [0.3, 0.3, 0.3],
                       [0.4, 0.4, 0.4]], jnp.float32)
    mask = jnp.ones(4, bool)
    pcr = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.float32)
    dyn, cnt_d = voxelize_mean(pts, mask, pcr, (1, 1, 1), (1, 1, 1))
    hard, cnt_h = voxelize_mean(pts, mask, pcr, (1, 1, 1), (1, 1, 1),
                                max_points=2)
    np.testing.assert_allclose(dyn[0, 0, 0], [0.25, 0.25, 0.25],
                               atol=1e-6)
    np.testing.assert_allclose(hard[0, 0, 0], [0.15, 0.15, 0.15],
                               atol=1e-6)
    assert cnt_d[0, 0, 0] == 4 and cnt_h[0, 0, 0] == 2


# compile-heavy: full tier only (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow
