"""Streaming DfM inference: cached prev features == full recompute."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dfm_tpu.apis import init_dfm_stream
from dfm_tpu.models import BatchMeta, DfMConfig


def _tiny_cfg():
    return DfMConfig(
        depth_num_bins=32, depth_downsample=4,
        point_cloud_range=(2, -3.2, -1, 8.4, 3.2, 0.6),
        voxel_size=(0.2, 0.2, 0.4),
        cv_channels=8, sem_channels=(32, 8), stereo_channels=(8, 8),
        bev_channels=16, backbone_depth=18,
        anchor_ranges=((2, -3.2, -0.6, 8.4, 3.2, -0.6),),
        anchor_sizes=((3.9, 1.6, 1.56),),
        assigner_cfgs=(dict(pos_iou_thr=0.6, neg_iou_thr=0.45,
                            min_pos_iou=0.45),),
        num_classes=1, nms_pre=64, max_num=8)


def test_stream_matches_full_recompute():
    cfg = _tiny_cfg()
    h, w = 32, 64
    handle = init_dfm_stream(cfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    f0 = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
    f1 = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 50.0
    cam[0, 2], cam[1, 2] = w / 2, h / 2
    meta = BatchMeta.identity(1, jnp.asarray(cam)[None])
    meta = dataclasses.replace(meta, org_w=jnp.full((1,), float(w)))

    img_pair = jnp.stack([f1, f0], axis=1)     # cur=f1, prev=f0
    variables = jax.jit(lambda r: handle['model'].init(
        r, img_pair, meta, train=False))(jax.random.PRNGKey(0))

    # full two-frame path on (f1, f0)
    det_full, _ = handle['infer_first'](variables, img_pair, meta)

    # streaming: process f0 first (self-pair), reuse its cache for f1
    _, cache0 = handle['infer_first'](
        variables, jnp.stack([f0, f0], 1), meta)
    det_stream, cache1 = handle['infer_stream'](variables, f1, meta,
                                                cache0)
    np.testing.assert_allclose(np.asarray(det_full['scores']),
                               np.asarray(det_stream['scores']),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(det_full['boxes3d']),
                               np.asarray(det_stream['boxes3d']),
                               rtol=1e-4, atol=1e-4)
    assert cache1.shape == cache0.shape


# compile-heavy: full tier only (pytest -m "not slow" skips)
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
