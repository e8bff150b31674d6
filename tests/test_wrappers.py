"""CBGS / Repeat wrappers + multi-sweep point loading
(reference dataset_wrappers.py:1, pipelines/loading.py:621)."""

import os

import numpy as np
import pytest

REF_LYFT = '/root/reference/tests/data/lyft'


class _FakeDS:
    CLASSES = ('car', 'ped')

    def __init__(self, cats_per_frame):
        self.cats = cats_per_frame
        self.infos = [dict() for _ in cats_per_frame]

    def __len__(self):
        return len(self.cats)

    def get_cat_ids(self, i):
        return set(self.cats[i])

    def get_sample(self, i):
        return i


def test_cbgs_balances_rare_class():
    # 9 car-only frames, 1 ped frame: ped share 0.1 -> resampled ~5x
    ds = _FakeDS([{0}] * 9 + [{1}])
    w = __import__('dfm_tpu.data.wrappers', fromlist=['CBGSDataset']
                   ).CBGSDataset(ds, seed=0)
    hist = w.class_histogram()
    # expected: each class gets ~len(inds)/share * frac frames:
    # car 9*(0.5/0.9)=5, ped 1*(0.5/0.1)=5
    assert hist[0] == 5 and hist[1] == 5
    # samples route through the wrapped dataset
    assert all(0 <= w.get_sample(i) < 10 for i in range(len(w)))


def test_cbgs_fallback_cat_ids():
    from dfm_tpu.data.wrappers import CBGSDataset

    class _NoHook:
        CLASSES = ('a', 'b')

        def __init__(self):
            self.infos = [
                dict(annos=dict(labels=np.array([0, 0]))),
                dict(annos=dict(labels=np.array([1]))),
            ]

        def __len__(self):
            return 2

        def get_sample(self, i):
            return i

    w = CBGSDataset(_NoHook(), seed=0)
    assert len(w) >= 2
    assert set(w.sample_indices) == {0, 1}


def test_repeat_dataset():
    from dfm_tpu.data.wrappers import RepeatDataset
    ds = _FakeDS([{0}, {1}])
    r = RepeatDataset(ds, 3)
    assert len(r) == 6
    assert [r.get_sample(i) for i in range(6)] == [0, 1, 0, 1, 0, 1]
    assert r.CLASSES == ds.CLASSES


@pytest.mark.skipif(not os.path.exists(REF_LYFT),
                    reason='lyft fixture not present')
def test_multisweep_real_lyft_bins():
    """Accumulate the fixture's 2 real sweeps onto the keyframe."""
    import pickle

    from dfm_tpu.data.wrappers import multisweep_points
    with open(os.path.join(REF_LYFT, 'lyft_infos.pkl'), 'rb') as f:
        d = pickle.load(f)
    info = (d['infos'] if isinstance(d, dict) else d)[0]
    key = np.fromfile(
        os.path.join(REF_LYFT, 'lidar',
                     os.path.basename(info['lidar_path'])),
        np.float32).reshape(-1, 5)
    n0 = len(key)

    # fixture paths point at the reference checkout; rebase to REF_LYFT
    info = dict(info)
    info['sweeps'] = [
        {**sw, 'data_path': os.path.join(
            REF_LYFT, 'lidar', os.path.basename(sw['data_path']))}
        for sw in info['sweeps']]

    pts = multisweep_points(key, info, sweeps_num=10,
                            test_mode=True)
    assert pts.shape[1] == 4
    assert len(pts) > n0                       # sweeps actually added
    # keyframe rows: time-lag channel exactly 0
    np.testing.assert_allclose(pts[:n0, 3], 0.0)
    # sweep rows: positive lag < 1 s (fixture sweeps are 200/400 ms old)
    lags = pts[n0:, 3]
    assert (lags > 0).all() and (lags < 1.0).all()
    assert len(np.unique(np.round(lags, 4))) == 2   # two sweeps
    # transformed sweep points stay in the same physical envelope
    assert np.abs(pts[n0:, :2]).max() < np.abs(key[:, :2]).max() * 1.5


@pytest.mark.skipif(not os.path.exists(REF_LYFT),
                    reason='lyft fixture not present')
def test_lyft_dataset_sweeps_and_cat_ids():
    from dfm_tpu.data.lyft import LyftDataset
    ds0 = LyftDataset(REF_LYFT, os.path.join(REF_LYFT, 'lyft_infos.pkl'),
                      train=False, max_points=4096, sweeps_num=0)
    ds10 = LyftDataset(REF_LYFT, os.path.join(REF_LYFT, 'lyft_infos.pkl'),
                       train=False, max_points=4096, sweeps_num=10)
    p0 = ds0._load_points(ds0.infos[0])
    p10 = ds10._load_points(ds10.infos[0])
    assert len(p10) > len(p0)
    cats = ds0.get_cat_ids(0)
    assert cats and all(0 <= c < len(ds0.CLASSES) for c in cats)
