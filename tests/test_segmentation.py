"""Semantic-segmentation stack: datasets on the reference's checked-in
fixtures, sliding-patch inference semantics, EncoderDecoder3D
forward/loss/grad for both backbones, and mIoU evaluation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = '/root/reference/tests/data'

TINY_SEG = dict(
    type='EncoderDecoder3D', num_classes=5, ignore_index=5,
    sa_points=(32, 16, 8, 4), sa_radii=(0.4, 0.8, 1.2, 2.4),
    sa_ks=(8, 8, 8, 8),
    sa_mlps=((8, 8), (8, 16), (16, 16), (16, 32)),
    fp_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
    channels=8, num_points=64, test_batch_size=2,
    use_normalized_coord=True)


# ---------------------------------------------------------------- datasets


@pytest.mark.skipif(not os.path.exists(f'{REF}/s3dis'), reason='no fixture')
def test_s3dis_fixture_loads_and_patches():
    from dfm_tpu.data.seg3d import S3DISSegDataset
    ds = S3DISSegDataset(f'{REF}/s3dis', f'{REF}/s3dis/s3dis_infos.pkl',
                         train=True, num_points=32)
    pts, labels = ds.load_scene(0)
    assert pts.shape == (100, 6) and labels.shape == (100,)
    # colors normalized to [0, 1]
    assert pts[:, 3:6].max() <= 1.0 + 1e-6
    # fixture semantic ids 0..12 map to themselves; 13 would be ignore
    assert labels.min() >= 0 and labels.max() <= 12
    s = ds[0]
    # patch: exact static shape, labels consistent with the scene
    assert s['points'].shape == (32, 9)   # xyz + rgb + normalized xyz
    assert s['seg_labels'].shape == (32,)
    assert set(np.unique(s['seg_labels'])) <= set(np.unique(labels))
    b = ds.batch(2)
    assert b['points'].shape == (2, 32, 9)


@pytest.mark.skipif(not os.path.exists(f'{REF}/scannet'),
                    reason='no fixture')
def test_scannet_fixture_label_mapping():
    from dfm_tpu.data.seg3d import ScanNetSegDataset
    ds = ScanNetSegDataset(f'{REF}/scannet',
                           f'{REF}/scannet/scannet_infos.pkl',
                           train=False)
    pts, labels = ds.load_scene(0)
    raw = np.fromfile(f'{REF}/scannet/semantic_mask/scene0000_00.bin',
                      np.int64)
    # nyu40 id 1 (wall) -> train id 0; id 0 (unannotated) -> ignore 20
    assert labels[raw == 1].tolist() == [0] * int((raw == 1).sum())
    assert (labels[raw == 0] == 20).all()
    assert labels.max() <= 20


@pytest.mark.skipif(not os.path.exists(f'{REF}/semantickitti'),
                    reason='no fixture')
def test_semantickitti_fixture_learning_map():
    from dfm_tpu.data.seg3d import SemanticKITTISegDataset
    ds = SemanticKITTISegDataset(
        f'{REF}/semantickitti',
        f'{REF}/semantickitti/semantickitti_infos.pkl', train=False)
    pts, labels = ds.load_scene(0)
    assert pts.shape == (50, 4)
    raw = np.fromfile(
        f'{REF}/semantickitti/sequences/00/labels/000000.label',
        np.uint32) & 0xFFFF
    # semantic-kitti ids: 50 = building -> 13, 70 = vegetation -> 15
    assert (labels[raw == 50] == 13).all()
    assert (labels[raw == 70] == 15).all()


def test_build_seg_dataset_from_config():
    from dfm_tpu.data.seg3d import build_seg_dataset, seg_ann_files
    d = dict(type='S3DISSegDataset', data_root=f'{REF}/s3dis',
             num_points=16)
    ann = seg_ann_files(d, train=True)
    assert ann == [f'{REF}/s3dis/s3dis_infos.pkl']  # fixture fallback
    ds = build_seg_dataset(d, train=True)
    assert ds[0]['points'].shape[0] == 16


# ------------------------------------------------------- sliding inference


def test_sliding_patches_cover_every_point():
    from dfm_tpu.models.segmentors import slide_merge, sliding_patches
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.rand(500, 3) * np.array([4.0, 3.0, 2.0]),
         rng.rand(500, 3)], axis=1).astype(np.float32)
    pp, pi = sliding_patches(pts, num_points=128, block_size=1.0,
                             sample_rate=0.5,
                             use_normalized_coord=True)
    assert pp.shape[1:] == (128, 9)
    assert np.unique(pi).shape[0] == 500      # total coverage
    # merge averages logits across duplicates: a constant per-point
    # logit must survive averaging exactly
    logits = np.zeros(pp.shape[:2] + (3,), np.float32)
    logits[..., 1] = 7.0
    merged = slide_merge(pi, logits, 500)
    np.testing.assert_allclose(merged[:, 1], 7.0, atol=1e-6)
    np.testing.assert_allclose(merged[:, 0], 0.0, atol=1e-6)


def test_patch_sample_exact_count_and_membership():
    from dfm_tpu.data.seg3d import patch_point_sample
    rng = np.random.RandomState(1)
    coords = rng.rand(300, 3).astype(np.float32) * 3.0
    mask = rng.randint(0, 5, 300)
    choices, center = patch_point_sample(rng, coords, mask, 64,
                                         block_size=1.0, ignore_index=5)
    assert choices.shape == (64,)
    assert (choices >= 0).all() and (choices < 300).all()
    # all sampled points lie in the (enlarged) block around center
    sel = coords[choices]
    assert (np.abs(sel[:, :2] - center[:2]) <= 0.5 + 0.2 + 1e-5).all()


# ------------------------------------------------------------------ model


def test_encoder_decoder3d_pointnet2_forward_loss_grad():
    from dfm_tpu.models import build_detector
    from dfm_tpu.runtime.adapters import get_adapter
    h = build_detector(TINY_SEG)
    adapter = get_adapter('EncoderDecoder3D')
    batch = adapter.synthetic_batch(h, 2, 0, n=64)
    args_m = adapter.model_args(batch)
    v = h.module.init(jax.random.PRNGKey(0), *args_m, train=False)
    logits = h.module.apply(v, *args_m, train=False)
    assert logits.shape == (2, 64, 5)

    def loss_fn(params):
        out, upd = h.module.apply(
            {'params': params, 'batch_stats': v['batch_stats']},
            *args_m, train=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(1)})
        total, parts = h.loss_fn(out, batch, h.cfg)
        return total, parts

    (total, parts), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(v['params'])
    assert jnp.isfinite(total)
    gnorm = sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(grads))
    assert jnp.isfinite(gnorm) and gnorm > 0
    pred = h.predict_fn(logits, h.cfg)
    assert pred.shape == (2, 64)


def test_encoder_decoder3d_dgcnn_forward():
    from dfm_tpu.models import build_detector
    mc = dict(type='EncoderDecoder3D', backbone='DGCNNBackbone',
              head='DGCNNHead', num_classes=4, ignore_index=4,
              dg_num_samples=(4, 4, 4),
              dg_gf_channels=((8, 8), (8, 8), (8,)),
              dg_fa_channels=(16,), dg_fp_channels=(16,), channels=8)
    h = build_detector(mc)
    pts = jnp.asarray(np.random.RandomState(0).rand(1, 48, 9),
                      jnp.float32)
    v = h.module.init(jax.random.PRNGKey(0), pts, train=False)
    logits = h.module.apply(v, pts, train=False)
    assert logits.shape == (1, 48, 4)
    assert jnp.isfinite(logits).all()


def test_ignored_labels_do_not_contribute_loss():
    from dfm_tpu.models.segmentors import (EncoderDecoder3DConfig,
                                           encoder_decoder3d_loss)
    cfg = EncoderDecoder3DConfig(num_classes=3, ignore_index=3)
    logits = jnp.asarray(np.random.RandomState(0).randn(1, 8, 3),
                         jnp.float32)
    labels = jnp.asarray([[0, 1, 2, 3, 3, 3, 3, 3]], jnp.int32)
    l_all, _ = encoder_decoder3d_loss(logits, dict(seg_labels=labels),
                                      cfg)
    # same loss when the ignored tail flips to a different garbage id
    labels2 = labels.at[0, 4:].set(3)
    l_same, _ = encoder_decoder3d_loss(logits, dict(seg_labels=labels2),
                                       cfg)
    np.testing.assert_allclose(float(l_all), float(l_same), rtol=1e-6)
    # only 3 valid points: mean of their NLLs
    logp = jax.nn.log_softmax(logits[0])
    expect = -(logp[0, 0] + logp[1, 1] + logp[2, 2]) / 3.0
    np.testing.assert_allclose(float(l_all), float(expect), rtol=1e-5)


def test_class_weighted_loss_matches_manual():
    from dfm_tpu.models.segmentors import (EncoderDecoder3DConfig,
                                           encoder_decoder3d_loss)
    cfg = EncoderDecoder3DConfig(num_classes=2, ignore_index=2,
                                 class_weight=(1.0, 3.0))
    logits = jnp.asarray([[[2.0, 0.0], [0.0, 2.0]]], jnp.float32)
    labels = jnp.asarray([[0, 1]], jnp.int32)
    loss, _ = encoder_decoder3d_loss(logits, dict(seg_labels=labels), cfg)
    logp = jax.nn.log_softmax(logits[0])
    expect = (-logp[0, 0] * 1.0 + -logp[1, 1] * 3.0) / 4.0
    np.testing.assert_allclose(float(loss), float(expect), rtol=1e-5)


# ------------------------------------------------------------- end-to-end


def test_seg_eval_perfect_prediction_is_miou_1():
    from dfm_tpu.data.seg3d import S3DISSegDataset
    if not os.path.exists(f'{REF}/s3dis'):
        pytest.skip('no fixture')
    ds = S3DISSegDataset(f'{REF}/s3dis', f'{REF}/s3dis/s3dis_infos.pkl',
                         train=False)
    _, labels = ds.load_scene(0)
    res = ds.evaluate([labels.copy()])
    assert res['miou'] == pytest.approx(1.0)
    assert res['acc'] == pytest.approx(1.0)


@pytest.mark.slow
def test_slide_inference_end_to_end_tiny_model():
    from dfm_tpu.models import build_detector
    from dfm_tpu.models.segmentors import slide_inference
    h = build_detector(TINY_SEG)
    rng = np.random.RandomState(0)
    scene = np.concatenate(
        [rng.rand(400, 3) * 2.0, rng.rand(400, 3)], axis=1
    ).astype(np.float32)
    probe = jnp.zeros((h.cfg.test_batch_size, h.cfg.num_points, 9),
                      jnp.float32)
    v = h.module.init(jax.random.PRNGKey(0), probe, train=False)
    apply_fn = jax.jit(
        lambda pts: h.module.apply(v, pts, train=False))
    import dataclasses
    cfg = dataclasses.replace(h.cfg, block_size=1.0, num_points=64)
    pred = slide_inference(apply_fn, scene, cfg)
    assert pred.shape == (400,)
    assert (pred >= 0).all() and (pred < 5).all()
