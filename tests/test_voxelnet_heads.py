"""VoxelNet head dispatch: shape_aware (SSN) + free_anchor modes
(reference models/builder.py type-name head dispatch;
dense_heads/shape_aware_head.py, free_anchor3d_head.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from dfm_tpu.models import build_detector
from dfm_tpu.runtime.adapters import get_adapter


def _grad_step(model_dict, n=512):
    handle = build_detector(model_dict)
    adapter = get_adapter(handle.type)
    batch = adapter.synthetic_batch(handle, 1, 0, n=n) \
        if 'n' in adapter.synthetic_batch.__code__.co_varnames \
        else adapter.synthetic_batch(handle, 1, 0)
    args = adapter.model_args(batch)
    vs = handle.module.init(jax.random.PRNGKey(0), *args, train=False)

    def loss_fn(params):
        out, _ = handle.module.apply(
            {**vs, 'params': params}, *args, train=True,
            mutable=['batch_stats'])
        total, losses = adapter.loss(handle, out, batch,
                                     jax.random.PRNGKey(1))
        return total, losses

    (total, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(vs['params'])
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    gnorm = sum(float(jnp.sum(g * g))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # decode path
    out, _ = handle.module.apply(vs, *args, train=False,
                                 mutable=['batch_stats'])
    det = adapter.predict(handle, out, batch)
    assert np.isfinite(np.asarray(det['boxes3d'])).all()
    return losses


def test_voxelnet_shape_aware_grad_step():
    losses = _grad_step(dict(
        type='VoxelNet', bbox_head='shape_aware', num_classes=3,
        point_cloud_range=(0, -8, -3, 16, 8, 1),
        voxel_size=(0.5, 0.5, 0.2),
        max_points_per_voxel=5, cv_channels=16, bev_channels=32,
        tasks=(
            dict(num_class=1, num_base_anchors=2,
                 shared_conv_channels=(16,), shared_conv_strides=(1,)),
            dict(num_class=2, num_base_anchors=4,
                 shared_conv_channels=(16,), shared_conv_strides=(2,)),
        ),
        anchor_ranges=((0, -8, -1.78, 16, 8, -1.78),
                       (0, -8, -0.6, 16, 8, -0.6),
                       (0, -8, -0.6, 16, 8, -0.6)),
        nms_pre=64, max_num=8))
    assert {'loss_cls', 'loss_bbox', 'loss_dir'} <= set(losses)


def test_voxelnet_free_anchor_grad_step():
    losses = _grad_step(dict(
        type='VoxelNet', bbox_head='free_anchor', num_classes=3,
        point_cloud_range=(0, -8, -3, 16, 8, 1),
        voxel_size=(0.5, 0.5, 0.2),
        max_points_per_voxel=5, cv_channels=16, bev_channels=32,
        pre_anchor_topk=8,
        anchor_ranges=((0, -8, -1.78, 16, 8, -1.78),
                       (0, -8, -0.6, 16, 8, -0.6),
                       (0, -8, -0.6, 16, 8, -0.6)),
        nms_pre=64, max_num=8))
    assert 'positive_bag_loss' in losses or 'loss_cls' in losses
