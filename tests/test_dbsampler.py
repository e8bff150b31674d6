"""GT-database creation + ObjectSample cut-and-paste."""

import numpy as np
import pytest

from dfm_tpu.core.box_np_ops import points_in_rbbox
from dfm_tpu.data.dbsampler import (DataBaseSampler, create_gt_database,
                                    paste_objects)


def _scene(rng, boxes, pts_per_box=30, bg=200):
    """Points: bg uniform + cluster inside each box."""
    pts = [rng.uniform(-20, 20, (bg, 3)).astype(np.float32)]
    for b in boxes:
        local = (rng.uniform(-0.4, 0.4, (pts_per_box, 3)) *
                 b[3:6]).astype(np.float32)
        c, s = np.cos(b[6]), np.sin(b[6])
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        pts.append((local @ rot.T + b[:3] +
                    [0, 0, b[5] / 2]).astype(np.float32))
    return np.concatenate(pts)


@pytest.fixture()
def db(tmp_path):
    rng = np.random.RandomState(0)
    infos = []
    for i in range(4):
        boxes = np.stack([
            np.array([i * 3.0, 0, 0, 3.9, 1.6, 1.5, 0.3 * i], np.float32),
            np.array([-5, i * 2.0, 0, 0.8, 0.6, 1.7, 0.0], np.float32)])
        pts = _scene(rng, boxes)
        infos.append(dict(
            sample_idx=i,
            annos=dict(names=['Car', 'Pedestrian'],
                       gt_boxes_pl=boxes,
                       labels=np.array([0, 1]),
                       difficulty=np.array([0, 0])),
            _pts=pts))
    path = create_gt_database(infos, str(tmp_path), str(tmp_path),
                              lambda info: info['_pts'])
    return path, str(tmp_path), infos


def test_create_gt_database(db):
    import pickle
    path, root, infos = db
    dbi = pickle.load(open(path, 'rb'))
    assert set(dbi) == {'Car', 'Pedestrian'}
    assert len(dbi['Car']) == 4
    e = dbi['Car'][0]
    assert e['num_points_in_gt'] > 0
    pts = np.fromfile(f'{root}/{e["path"]}', np.float32).reshape(-1, 3)
    assert len(pts) == e['num_points_in_gt']
    # crops are stored box-origin-relative: re-centering puts them
    # inside the box
    back = pts + e['box3d_lidar'][:3]
    assert points_in_rbbox(back, e['box3d_lidar'][None])[:, 0].all()


def test_paste_objects(db):
    path, root, infos = db
    sampler = DataBaseSampler(
        path, root, sample_groups=dict(Car=6, Pedestrian=6),
        classes=['Car', 'Pedestrian'],
        filter_by_min_points=dict(Car=5, Pedestrian=5))
    rng = np.random.RandomState(1)
    gt_boxes = np.array([[20.0, 10.0, 0, 3.9, 1.6, 1.5, 0.0]],
                        np.float32)
    gt_labels = np.array([0])
    points = rng.uniform(-20, 20, (300, 3)).astype(np.float32)
    p2, b2, l2 = paste_objects(points, gt_boxes, gt_labels, sampler)
    assert len(b2) > len(gt_boxes)
    assert len(l2) == len(b2)
    # no BEV collisions among the final box set
    from dfm_tpu.data.dbsampler import _bev_collision
    coll = _bev_collision(b2, b2)
    np.fill_diagonal(coll, False)
    assert not coll.any()
    # pasted boxes contain points; original inside-points removed
    pasted = b2[len(gt_boxes):]
    inside = points_in_rbbox(p2, pasted)
    n_sampled = inside[:len(p2) - len(points)].sum()
    assert inside.any(axis=0).all() or n_sampled > 0
    orig_kept = p2[-len(points):] if len(p2) >= len(points) else p2
    del orig_kept


def test_sample_all_respects_existing_count(db):
    path, root, _ = db
    sampler = DataBaseSampler(path, root,
                              sample_groups=dict(Car=2),
                              classes=['Car', 'Pedestrian'])
    # already 2 cars in the scene -> nothing sampled
    gt_boxes = np.zeros((2, 7), np.float32)
    gt_boxes[:, 3:6] = 1
    gt_boxes[0, :2] = (50, 50)
    gt_boxes[1, :2] = (60, 60)
    res = sampler.sample_all(gt_boxes, np.array([0, 0]))
    assert res is None


def test_kitti_lidar_source_with_objectsample(tmp_path, monkeypatch):
    """End-to-end: mini on-disk KITTI -> GT db -> KittiLidarSource
    batch with ObjectSample pasting."""
    import sys, types, pickle
    sys.path.insert(0, '/root/repo')
    rng = np.random.RandomState(0)
    root = tmp_path
    (root / 'training' / 'velodyne').mkdir(parents=True)
    infos = []
    for i in range(3):
        boxes = np.stack([
            np.array([10.0 + i, 0, -1.0, 3.9, 1.6, 1.5, 0.1], np.float32),
            np.array([15.0, 5.0 - i, -1.0, 0.8, 0.6, 1.7, 0.0],
                     np.float32)])
        pts = _scene(rng, boxes, bg=500)
        # clamp into the SECOND range (x in [0, 70.4])
        pts[:, 0] = np.abs(pts[:, 0])
        # store raw velodyne such that identity-calib
        # lidar_to_rect + rect_to_lidar_pseudo reproduces pts:
        # pl = (z_rect, -x_rect, -y_rect) => raw = (-y_pl, -z_pl, x_pl)
        raw3 = np.stack([-pts[:, 1], -pts[:, 2], pts[:, 0]], axis=1)
        raw = np.concatenate([raw3,
                              np.zeros((len(raw3), 1), np.float32)],
                             axis=1).astype(np.float32)
        raw.tofile(root / 'training' / 'velodyne' / f'{i:06d}.bin')
        infos.append(dict(
            sample_idx=i,
            velodyne_path=f'training/velodyne/{i:06d}.bin',
            calib=dict(P2=np.eye(4, dtype=np.float32)[:3],
                       R0_rect=np.eye(3, dtype=np.float32),
                       Tr_velo_to_cam=np.eye(4, dtype=np.float32)[:3]),
            annos=dict(names=['Car', 'Pedestrian'], gt_boxes_pl=boxes,
                       labels=np.array([0, 1]),
                       difficulty=np.array([0, 0]))))
    with open(root / 'kitti_infos_train.pkl', 'wb') as f:
        pickle.dump(infos, f)

    # identity calib => lidar_to_rect/rect_to_lidar_pseudo round-trips
    from dfm_tpu.data.kitti import KittiDataset
    ds = KittiDataset(str(root), infos, train=True)
    db = create_gt_database(infos, str(root), str(root),
                            lambda info: ds._load_points_pl(info))
    assert db.endswith('dfm_gt_database_infos.pkl')

    from tools.train import KittiLidarSource

    class _D(dict):
        __getattr__ = dict.__getitem__
        def get(self, k, d=None):
            return dict.get(self, k, d)
    cfg = _D(data=_D(type='KittiDataset', data_root=str(root),
                     max_points=2048, max_gt=16),
             model=_D(point_cloud_range=(0, -40, -3, 70.4, 40, 3)))
    src = KittiLidarSource(cfg, batch_size=2, train=True)
    assert src.sampler is not None
    batch = src.next_batch(0, np.random.default_rng(0))
    assert batch['points'].shape == (2, 2048, 3)
    assert batch['gt_boxes'].shape == (2, 16, 7)
    # ObjectSample should have pasted extra GTs beyond the scene's 2
    assert int(np.asarray(batch['gt_mask']).sum(axis=1).max()) > 2
