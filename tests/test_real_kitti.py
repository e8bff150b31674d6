"""First real-data coverage: the reference's checked-in mini KITTI.

`/root/reference/tests/data/kitti/` ships 2 real frames (PNG images,
a real velodyne scan, real calib + a prebuilt mmdet3d info pkl) — the
same fixtures the reference's own dataset tests consume
(tests/test_data/test_datasets/test_kitti_dataset.py:1). Here the REAL
pipeline runs on them end to end: reference-pkl -> native infos ->
image decode -> aug -> GenerateDepthMap on the real scan -> packed
sample, with assertions on the physical statistics of the result.
"""

import os
import pickle

import numpy as np
import pytest

REF_KITTI = '/root/reference/tests/data/kitti'

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_KITTI, 'kitti_infos_train.pkl')),
    reason='reference mini-KITTI fixture not present')


@pytest.fixture(scope='module')
def native_infos():
    from dfm_tpu.data.kitti import infos_from_reference_pkl
    return infos_from_reference_pkl(
        os.path.join(REF_KITTI, 'kitti_infos_train.pkl'))


def test_info_conversion(native_infos):
    infos = native_infos
    assert len(infos) == 1
    i = infos[0]
    assert i['image']['image_path'] == 'training/image_2/000000.png'
    assert i['velodyne_path'] == 'training/velodyne/000000.bin'
    # the one GT is a Pedestrian at camera (1.84, 1.47, 8.41)
    assert list(i['annos']['names']) == ['Pedestrian']
    box = i['annos']['gt_boxes_pl'][0]
    # pseudo-lidar: (z, -x, y-ish) with bottom-center -> x=8.41, y=-1.84
    np.testing.assert_allclose(box[0], 8.41, atol=1e-3)
    np.testing.assert_allclose(box[1], -1.84, atol=1e-3)
    # dims (l, w, h) = (1.2, 0.48, 1.89)
    np.testing.assert_allclose(box[3:6], [1.2, 0.48, 1.89], atol=1e-3)
    # eval annos keep the raw camera-frame record
    np.testing.assert_allclose(
        i['annos_eval']['bbox'][0], [712.4, 143.0, 810.73, 307.92],
        atol=1e-2)


def test_real_pipeline_sample(native_infos):
    """Decode the real PNG, project the real scan, and check physics."""
    from dfm_tpu.data.kitti import KittiDataset

    ds = KittiDataset(REF_KITTI, native_infos, train=False)
    s = ds.get_sample(0, np.random.default_rng(0))

    # image: 2 frames (static fallback), normalized, non-constant
    img = s['img']
    assert img.shape == (2, 320, 1280, 3)
    assert np.isfinite(img).all()
    assert img.std() > 0.3          # a real photograph, not padding
    np.testing.assert_allclose(img[0], img[1], atol=1e-6)  # no sweeps

    # depth map from the real velodyne scan (800 points, FoV+range
    # filtered): sparse but present, values inside the [2, 59.6] range
    d = s['depth_img']
    nz = d > 0
    assert 50 <= nz.sum() <= 800, nz.sum()
    assert d[nz].min() >= 2.0 and d[nz].max() <= 59.6
    # depth pixels must back-project to points inside the cloud's
    # actual extent (x in [11.5, 72] m for this scan): roundtrip the
    # median-depth pixel through the augmented intrinsics
    vs, us = np.nonzero(nz)
    k = np.argsort(d[nz])[len(us) // 2]
    c2i = s['cam2img']
    zc = d[nz][k]
    xc = (us[k] - c2i[0, 2]) * zc / c2i[0, 0]
    # camera x ~ lateral: within the scan's y extent
    assert -17.0 <= xc <= 17.0
    assert 11.0 <= zc <= 72.5
    # the checked-in 800-pt subsample has NO points inside the GT box
    # (min x = 11.57 m vs the pedestrian at 8.41 m) -> fg mask empty;
    # num_points_in_gt=377 in the pkl refers to the original full scan
    assert (s['depth_fgmask_img'] > 0).sum() == 0

    # GT packing
    assert s['gt_mask'].sum() == 1
    np.testing.assert_allclose(s['gt_boxes'][0][:2], [8.41, -1.84],
                               atol=1e-3)

    # geometry meta round-trip: projecting the GT center with the
    # (possibly crop-shifted) cam2img must land inside the 2D box
    c2i = s['cam2img']
    x, y, z = 1.84, 1.47 - 1.89 / 2, 8.41   # 3D center, camera frame
    uvw = c2i[:3, :3] @ np.array([x, y, z]) + c2i[:3, 3]
    u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
    off = s['crop_offset']
    assert 712.4 - off[0] <= u <= 810.73 - off[0]
    assert 143.0 - off[1] <= v <= 307.92 - off[1]


def test_real_pipeline_train_aug(native_infos):
    """Train-mode aug on real data keeps depth/fg statistics sane."""
    from dfm_tpu.data.kitti import KittiDataset

    ds = KittiDataset(REF_KITTI, native_infos, train=True)
    for seed in range(3):
        s = ds.get_sample(0, np.random.default_rng(seed))
        d = s['depth_img']
        nz = d > 0
        assert nz.sum() >= 30
        assert d[nz].min() >= 2.0 and d[nz].max() <= 59.6
        assert s['gt_mask'].sum() == 1
