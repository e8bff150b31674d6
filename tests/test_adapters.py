"""Every detector family takes one real gradient step through the
generic adapter table (runtime/adapters.py) — the contract behind the
registry-driven tools/train.py.

Mirrors the reference's guarantee that mmcv's runner can call
`model.train_step(data)` for every registered detector
(tools/train.py:116 drives every config); here the uniform surface is
(model_args, loss, synthetic_batch) per family, and "trains" means
finite loss + finite nonzero grads, not just a forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfm_tpu.models import build_detector, detector_types
from dfm_tpu.runtime import create_train_state, make_optimizer, \
    make_train_step
from dfm_tpu.runtime.adapters import adapter_types, get_adapter

# tiny-model overrides per family: full production shapes live in
# configs/; these exist to make a CPU grad step cheap
TINY = {
    'DfM': dict(type='DfM', depth_num_bins=16,
                voxel_size=(7.2, 7.6, 1.0),
                num_depth_sample_pixels=16, nms_pre=64, max_num=8),
    'DfMFull': dict(type='DfMFull', depth_num_bins=16,
                    voxel_size=(7.2, 7.6, 1.0),
                    num_depth_sample_pixels=16, nms_pre=64, max_num=8),
    'FCOSMono3D': dict(type='FCOSMono3D', num_classes=3,
                       backbone_depth=18, in_channels=32,
                       feat_channels=32, stacked_convs=1),
    'PGD': dict(type='PGD', num_classes=3, backbone_depth=18,
                in_channels=32, feat_channels=32, stacked_convs=1),
    'SMOKEMono3D': dict(type='SMOKEMono3D', num_classes=3, max_objs=8,
                        topk=8, use_dcn_neck=False),
    'MonoFlex': dict(type='MonoFlex', num_classes=3, max_objs=8),
    'VoxelNet': dict(type='VoxelNet', voxel_size=(3.6, 3.8, 0.5),
                     nms_pre=64, max_num=8),
    'DynamicVoxelNet': dict(type='DynamicVoxelNet',
                            voxel_size=(3.6, 3.8, 0.5),
                            nms_pre=64, max_num=8),
    'SASSD': dict(type='SASSD', voxel_size=(3.6, 3.8, 0.5),
                  nms_pre=64, max_num=8),
    'CenterPoint': dict(type='CenterPoint', voxel_size=(4.4, 4.0, 1.0),
                        encoder_channels=8, second_channels=(16, 32),
                        second_layers=(1, 1), fpn_channels=(16, 16)),
    'VoteNet': dict(type='VoteNet', num_classes=4, num_proposals=16,
                    mean_sizes=tuple((0.8, 0.8, 0.9)
                                     for _ in range(4))),
    'SSD3DNet': dict(type='SSD3DNet', num_classes=2, num_candidates=16,
                     sa_num_points=((128,), (32,), (16, 16)),
                     sa_radii=((0.4, 0.8), (0.8, 1.6), (1.6, 4.8)),
                     sa_num_samples=((8, 8), (8, 8), (8, 8)),
                     sa_channels=(((8, 16), (8, 16)),
                                  ((16, 32), (16, 32)),
                                  ((32, 32), (32, 32))),
                     sa_aggregation=(16, 32, 64),
                     sa_fps_ranges=((-1,), (-1,), (32, -1)),
                     agg_radii=(1.6, 3.2), agg_ks=(4, 8),
                     agg_mlps=((32, 32), (32, 64)),
                     shared_channels=(32, 32), nms_pre=16, max_num=8),
    'GroupFree3DNet': dict(
        type='GroupFree3DNet', num_classes=4, num_proposal=16,
        num_decoder_layers=2, embed_dims=32, num_heads=4,
        ffn_channels=64,
        mean_sizes=tuple((0.8, 0.8, 0.9) for _ in range(4)),
        sa_points=(64, 32, 16, 8), sa_ks=(8, 8, 8, 8),
        sa_mlps=((8, 16), (16, 32), (16, 32), (16, 32)),
        fp_channels=((32, 32), (32, 32)), max_num=16),
    'ImVoxelNet': dict(type='ImVoxelNet', backbone_depth=18,
                       feat_channels=16,
                       voxel_range=(0, -6.4, -3, 12.8, 6.4, 1),
                       voxel_grid=(4, 8, 8),
                       anchor_ranges=((0, -6.4, -1.78, 12.8, 6.4,
                                       -1.78),),
                       nms_pre=64, max_num=8),
    'MultiViewDfM': dict(type='MultiViewDfM', backbone_depth=18,
                         feat_channels=16, num_views=2,
                         voxel_range=(0, -6.4, -3, 12.8, 6.4, 1),
                         voxel_grid=(4, 8, 8),
                         anchor_ranges=((0, -6.4, -1.78, 12.8, 6.4,
                                         -1.78),),
                         nms_pre=64, max_num=8),
    'PointRCNN': dict(type='PointRCNN', num_proposals=8,
                      roi_num_points=32, max_num=8,
                      sa_points=(64, 32, 16, 8),
                      sa_radii=((0.5, 1.0), (1.0, 2.0), (2.0, 4.0),
                                (4.0, 8.0)),
                      sa_samples=((4, 8),) * 4),
    'ImVoteNet': dict(type='ImVoteNet', num_classes=4,
                      num_proposals=16,
                      mean_sizes=tuple((0.8, 0.8, 0.9)
                                       for _ in range(4))),
    'H3DNet': dict(type='H3DNet', num_classes=4, num_proposals=16,
                   num_backbones=2,
                   mean_sizes=tuple((0.8, 0.8, 0.9)
                                    for _ in range(4))),
    'MVXFasterRCNN': dict(type='MVXFasterRCNN', num_classes=3,
                          point_cloud_range=(0, -8, -3, 16, 8, 1),
                          voxel_size=(0.8, 0.8, 0.5),
                          cv_channels=8, bev_channels=16,
                          img_backbone_depth=18, img_channels=16,
                          fusion_mid=16,
                          anchor_ranges=((0, -8, -0.6, 16, 8,
                                          -0.6),) * 3,
                          anchor_sizes=((0.8, 0.6, 1.73),
                                        (1.76, 0.6, 1.73),
                                        (3.9, 1.6, 1.56)),
                          nms_pre=64, max_num=8),
    'PartA2': dict(type='PartA2', num_classes=3,
                   point_cloud_range=(0, -8, -3, 16, 8, 1),
                   voxel_size=(0.5, 0.5, 0.5),
                   sparse_shape=(8, 32, 32), voxel_capacity=256,
                   unet_base=8, bev_channels=16, num_proposals=8,
                   roi_grid=4, max_num=8,
                   anchor_ranges=((0, -8, -0.6, 16, 8, -0.6),) * 3,
                   anchor_sizes=((0.8, 0.6, 1.73), (1.76, 0.6, 1.73),
                                 (3.9, 1.6, 1.56)),
                   nms_pre=64),
}


def test_every_registered_type_has_adapter():
    assert set(detector_types()) == set(adapter_types())


@pytest.mark.parametrize('ttype', sorted(TINY))
def test_one_grad_step(ttype):
    handle = build_detector(TINY[ttype])
    adapter = get_adapter(ttype)
    batch = adapter.synthetic_batch(handle, 1, 0)
    args = adapter.model_args(batch)

    variables = handle.module.init(jax.random.PRNGKey(0), *args,
                                   train=False)
    tx = make_optimizer(1e-4)
    state = create_train_state(variables, tx)
    step = make_train_step(
        handle.module,
        lambda o, bt, r: adapter.loss(handle, o, bt, r),
        donate=False, model_args_fn=adapter.model_args)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss'])), metrics
    assert np.isfinite(float(metrics['grad_norm']))
    assert float(metrics['grad_norm']) > 0
    # params actually moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        state2.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0


# grad-step sweeps: excluded from the fast tier, selectable as their
# own mid tier (`pytest -m family_smoke`) so every family's grad step
# runs each round without paying the full slow tier
pytestmark = [pytest.mark.slow, pytest.mark.family_smoke]
