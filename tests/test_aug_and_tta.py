"""Aug family (GlobalRotScaleTrans, object filters) and TTA merge."""

import numpy as np

from dfm_tpu.data.pipeline import (global_rot_scale_trans,
                                   ignored_object_filter,
                                   truncated_object_filter)
from dfm_tpu.data.tta import (flip_detections_back, merge_aug_detections)


def test_truncated_filter():
    annos = dict(truncated=np.array([0.0, 0.99, 0.5]),
                 labels=np.array([0, 1, 2]),
                 bbox=np.zeros((3, 4)), plane=np.ones(4))
    out = truncated_object_filter(annos, truncated_threshold=0.98)
    np.testing.assert_array_equal(out['labels'], [0, 2])
    assert out['bbox'].shape == (2, 4)
    assert out['plane'].shape == (4,)          # passed through


def test_ignored_filter():
    annos = dict(labels=np.array([0, -1, 2]), truncated=np.zeros(3))
    out = ignored_object_filter(annos)
    np.testing.assert_array_equal(out['labels'], [0, 2])


def test_global_rot_scale_trans_consistency():
    """Points inside a box stay inside after the shared transform."""
    rng = np.random.RandomState(0)
    box = np.array([[5.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3]], np.float32)
    # points at the box center and corners-ish
    pts = np.array([[5.0, 2.0, 0.75], [5.5, 2.2, 0.2]], np.float32)
    p2, b2, info = global_rot_scale_trans(
        pts, box, rng, translation_std=(0.5, 0.5, 0.1))
    assert abs(info['scale'] - 1.0) < 0.06
    # the point 0.75 m above the bottom center stays at (scaled) height
    # above the transformed bottom center
    np.testing.assert_allclose(
        p2[0], b2[0, :3] + [0, 0, 0.75 * info['scale']], atol=1e-5)
    # distances scale by `scale`
    d_before = np.linalg.norm(pts[1] - pts[0])
    d_after = np.linalg.norm(p2[1] - p2[0])
    np.testing.assert_allclose(d_after, d_before * info['scale'], rtol=1e-5)
    # yaw advanced by the rotation angle
    np.testing.assert_allclose(b2[0, 6], 0.3 + info['rotation'], atol=1e-6)


def test_flip_back_involution():
    b = np.array([[4.0, 1.0, 0.2, 3.9, 1.6, 1.5, 0.4]], np.float32)
    np.testing.assert_allclose(
        flip_detections_back(flip_detections_back(b)), b)


def test_merge_aug_detections():
    """A flipped duplicate of the same physical box merges to one."""
    box = np.array([[10.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.2]], np.float32)
    res_plain = dict(boxes_3d=box, scores_3d=np.array([0.8]),
                     labels_3d=np.array([0]))
    res_flip = dict(boxes_3d=flip_detections_back(box),  # as seen flipped
                    scores_3d=np.array([0.7]), labels_3d=np.array([0]))
    merged = merge_aug_detections(
        [res_plain, res_flip],
        [dict(flip=False), dict(flip=True)], nms_thr=0.3)
    assert len(merged['scores_3d']) == 1
    assert merged['scores_3d'][0] == np.float32(0.8)
    np.testing.assert_allclose(merged['boxes_3d'][0], box[0], atol=1e-5)

    # a distinct second box from another class survives
    res2 = dict(boxes_3d=np.array([[20.0, -3.0, 0.0, 0.8, 0.6, 1.7, 0.0]],
                                  np.float32),
                scores_3d=np.array([0.5]), labels_3d=np.array([1]))
    merged = merge_aug_detections(
        [res_plain, res2], [dict(flip=False), dict(flip=False)])
    assert len(merged['scores_3d']) == 2
    assert set(merged['labels_3d'].tolist()) == {0, 1}


def test_fuse_conv_bn_equivalence():
    """Fused variables give identical eval-mode outputs (reference
    tools/misc/fuse_conv_bn.py role)."""
    import jax
    import jax.numpy as jnp
    from dfm_tpu.models.backbones.liga_resnet import LigaBasicBlock
    from dfm_tpu.utils.fuse_conv_bn import fuse_conv_bn
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    mod = LigaBasicBlock(16, norm='bn', with_out_relu=True)
    var = mod.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial running stats
    var = jax.tree.map(np.asarray, var)
    for bn in var['batch_stats'].values():
        bn['mean'] = rng.randn(*bn['mean'].shape).astype(np.float32) * 0.3
        bn['var'] = rng.rand(*bn['var'].shape).astype(np.float32) + 0.5
    ref = mod.apply(var, x, train=False)
    fused, n = fuse_conv_bn(var)
    assert n == 2
    out = mod.apply(fused, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
