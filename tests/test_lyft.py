"""Lyft dataset + Kaggle-metric evaluation."""

import os

import numpy as np
import pytest

REF = '/root/reference/tests/data/lyft'


def _mini(tmp_path):
    """Synthetic lyft-format tree (infos + lidar bins)."""
    import pickle
    rng = np.random.RandomState(0)
    (tmp_path / 'lidar').mkdir()
    infos = []
    for i in range(2):
        pts = rng.uniform(-30, 30, (500, 3)).astype(np.float32)
        raw = np.concatenate(
            [pts, np.zeros((500, 2), np.float32)], 1)
        p = tmp_path / 'lidar' / f'{i}.bin'
        raw.tofile(p)
        infos.append(dict(
            lidar_path=str(p), token=str(i), sweeps=[], cams={},
            timestamp=float(i),
            gt_boxes=np.array([[5.0, 0, 0.75, 4, 2, 1.5, 0.2],
                               [-8.0, 3, 0.9, 1.8, 0.6, 1.8, 0.0]],
                              np.float32),
            gt_names=np.array(['car', 'pedestrian'])))
    path = tmp_path / 'lyft_infos_val.pkl'
    with open(path, 'wb') as f:
        pickle.dump(dict(infos=infos, metadata={'version': 'test'}), f)
    return str(tmp_path), str(path)


def test_lyft_dataset_samples_and_perfect_map(tmp_path):
    from dfm_tpu.data.lyft import LyftDataset
    root, info_path = _mini(tmp_path)
    ds = LyftDataset(root, info_path, train=False, max_points=256,
                     max_gt=8)
    assert len(ds) == 2
    s = ds.get_sample(0)
    assert s['points'].shape == (256, 3)
    assert int(s['gt_mask'].sum()) == 2
    # perfect predictions -> lyft mAP 1.0 (note gt_annos returns
    # bottom-center z)
    gts = ds.gt_annos()
    dts = [dict(boxes3d=g['gt_boxes'],
                scores=np.ones(len(g['gt_boxes']), np.float32),
                labels=g['gt_labels']) for g in gts]
    res = ds.evaluate(dts)
    assert res['mAP_lyft'] == pytest.approx(1.0)
    # slightly-off boxes pass 0.5 IoU but fail 0.95 -> mAP in (0, 1)
    dts2 = [dict(boxes3d=g['gt_boxes'] +
                 np.array([0.25, 0, 0, 0, 0, 0, 0], np.float32),
                 scores=np.ones(len(g['gt_boxes']), np.float32),
                 labels=g['gt_labels']) for g in gts]
    res2 = ds.evaluate(dts2)
    assert 0.0 < res2['mAP_lyft'] < 1.0


@pytest.mark.skipif(not os.path.isdir(REF), reason='no reference data')
def test_lyft_reference_fixture_loads():
    from dfm_tpu.data.lyft import LyftDataset
    ds = LyftDataset(REF, f'{REF}/lyft_infos.pkl', train=False,
                     max_points=128, max_gt=8)
    assert len(ds) >= 1
    s = ds.get_sample(0)
    assert s['points'].shape == (128, 3)
    assert np.isfinite(s['points']).all()
    assert int(s['gt_mask'].sum()) >= 1
