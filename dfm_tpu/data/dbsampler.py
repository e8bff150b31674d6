"""GT database creation + ObjectSample cut-and-paste augmentation.

Equivalents of the reference's strongest LiDAR augmentation stack:
  * `create_gt_database` (tools/data_converter/create_gt_database.py:
    110-245): crop every annotated object's points into per-object
    .bin files + a `dbinfos` pkl, keyed by class;
  * `DataBaseSampler` (mmdet3d/datasets/pipelines/dbsampler.py:81-340):
    shuffled cyclic per-class sampling with difficulty / min-points
    filters and a rotated-BEV collision test against scene + already-
    sampled boxes;
  * `ObjectSample` (mmdet3d/datasets/pipelines/transforms_3d.py:
    382-470): paste sampled objects into the scene — original points
    inside pasted boxes removed, sampled points concatenated FIRST
    (reference points.cat([sampled_points, points]) order).

Pure numpy host-side code (augmentation never runs under jit); frames
are whatever the dataset stores (pseudo-lidar for the KITTI path) —
the math is frame-agnostic as long as boxes/points agree.
"""

import os
import pickle

import numpy as np

from ..core.box_np_ops import points_in_rbbox
from ..evaluation.kitti_eval import _bev_corners, _rect_poly_area2

__all__ = ['create_gt_database', 'BatchSampler', 'DataBaseSampler',
           'paste_objects']


def _bev_collision(boxes1, boxes2):
    """(N, M) bool — rotated BEV rectangles intersect (area > 0)."""
    if len(boxes1) == 0 or len(boxes2) == 0:
        return np.zeros((len(boxes1), len(boxes2)), bool)
    inter = _rect_poly_area2(
        _bev_corners(np.asarray(boxes1, np.float64)[:, [0, 1, 3, 4, 6]]),
        _bev_corners(np.asarray(boxes2, np.float64)[:, [0, 1, 3, 4, 6]]))
    return inter > 1e-8


def create_gt_database(infos, data_root, out_dir, load_points_fn,
                       db_prefix='dfm_gt_database'):
    """Build the cut-and-paste database from dataset infos.

    Args:
        infos: list of info dicts with 'annos' ({'names',
            'gt_boxes_pl' (G, 7), 'labels', optional 'difficulty'}).
        data_root: dataset root (for the points loader).
        out_dir: directory receiving `<db_prefix>/` .bin crops and
            `<db_prefix>_infos.pkl`.
        load_points_fn: info -> (P, 3+) points in the box frame.

    Returns:
        path of the written dbinfos pkl.
    """
    db_dir = os.path.join(out_dir, db_prefix)
    os.makedirs(db_dir, exist_ok=True)
    db_infos = {}
    for info in infos:
        pts = load_points_fn(info)
        if pts is None:
            continue
        annos = info['annos']
        boxes = np.asarray(annos['gt_boxes_pl'], np.float32)
        names = list(annos['names'])
        if len(boxes) == 0:
            continue
        sid = str(info.get('sample_idx',
                           info.get('image_idx', len(db_infos))))
        inside = points_in_rbbox(pts, boxes)              # (P, G)
        diffs = annos.get('difficulty', np.zeros(len(boxes), np.int32))
        for gi, name in enumerate(names):
            obj_pts = pts[inside[:, gi]].astype(np.float32)
            obj_pts = obj_pts.copy()
            obj_pts[:, :3] -= boxes[gi, :3]               # box-origin frame
            fname = f'{sid}_{name}_{gi}.bin'
            obj_pts.tofile(os.path.join(db_dir, fname))
            db_infos.setdefault(name, []).append(dict(
                name=name,
                path=os.path.join(db_prefix, fname),
                gt_idx=gi,
                box3d_lidar=boxes[gi].copy(),
                num_points_in_gt=int(inside[:, gi].sum()),
                difficulty=int(np.asarray(diffs)[gi]
                               if gi < len(np.asarray(diffs)) else 0)))
    info_path = os.path.join(out_dir, f'{db_prefix}_infos.pkl')
    with open(info_path, 'wb') as f:
        pickle.dump(db_infos, f)
    return info_path


class BatchSampler:
    """Shuffled cyclic sampler over one class's db entries
    (reference dbsampler.py:14-78)."""

    def __init__(self, sampled_list, rng=None):
        self._list = sampled_list
        self._rng = rng or np.random.RandomState(0)
        self._indices = self._rng.permutation(len(sampled_list))
        self._idx = 0

    def sample(self, num):
        if self._idx + num >= len(self._list):
            out = self._indices[self._idx:].copy()
            self._indices = self._rng.permutation(len(self._list))
            self._idx = 0
        else:
            out = self._indices[self._idx:self._idx + num]
            self._idx += num
        return [self._list[i] for i in out]


class DataBaseSampler:
    """Per-class GT sampler with filters + collision rejection."""

    def __init__(self, info_path, data_root, sample_groups, classes,
                 rate=1.0, filter_by_difficulty=(-1,),
                 filter_by_min_points=None, num_point_features=3,
                 seed=0):
        self.data_root = data_root
        self.rate = rate
        self.classes = list(classes)
        self.cat2label = {n: i for i, n in enumerate(self.classes)}
        self.num_point_features = num_point_features
        with open(info_path, 'rb') as f:
            db_infos = pickle.load(f)
        if filter_by_difficulty:
            db_infos = {
                k: [i for i in v
                    if i['difficulty'] not in set(filter_by_difficulty)]
                for k, v in db_infos.items()}
        for name, min_num in (filter_by_min_points or {}).items():
            if name in db_infos and min_num > 0:
                db_infos[name] = [i for i in db_infos[name]
                                  if i['num_points_in_gt'] >= min_num]
        self.db_infos = db_infos
        rng = np.random.RandomState(seed)
        self.samplers = {k: BatchSampler(v, rng)
                         for k, v in db_infos.items() if v}
        self.sample_groups = dict(sample_groups)

    def sample_all(self, gt_bboxes, gt_labels):
        """Sample up to (group max - existing count) boxes per class,
        rejecting BEV collisions (reference dbsampler.py:204-340).

        Returns None or dict(gt_boxes (S, 7), gt_labels (S,),
        points (P, F))."""
        sampled, sampled_boxes = [], []
        avoid = np.asarray(gt_bboxes, np.float32).reshape(-1, 7)
        for name, max_num in self.sample_groups.items():
            label = self.cat2label[name]
            num = int(max_num) - int(np.sum(gt_labels == label))
            num = int(np.round(self.rate * num))
            if num <= 0 or name not in self.samplers:
                continue
            cands = self.samplers[name].sample(num)
            if not cands:
                continue
            cand_boxes = np.stack([c['box3d_lidar'] for c in cands])
            # greedy accept in order, testing against scene + accepted
            for c, box in zip(cands, cand_boxes):
                if _bev_collision(box[None], avoid).any():
                    continue
                sampled.append(c)
                sampled_boxes.append(box)
                avoid = np.concatenate([avoid, box[None]], axis=0)
        if not sampled:
            return None
        boxes = np.stack(sampled_boxes)
        pts_list = []
        for c, box in zip(sampled, boxes):
            p = np.fromfile(os.path.join(self.data_root, c['path']),
                            np.float32).reshape(
                                -1, self.num_point_features)
            p = p.copy()
            p[:, :3] += box[:3]
            pts_list.append(p)
        labels = np.asarray([self.cat2label[c['name']] for c in sampled],
                            np.int64)
        points = np.concatenate(pts_list, axis=0) if pts_list else \
            np.zeros((0, self.num_point_features), np.float32)
        return dict(gt_boxes=boxes, gt_labels=labels, points=points)


def paste_objects(points, gt_boxes, gt_labels, sampler):
    """ObjectSample: paste database objects into a scene.

    Args:
        points: (P, F) scene points.
        gt_boxes: (G, 7); gt_labels: (G,).
        sampler: DataBaseSampler.

    Returns:
        (points', gt_boxes', gt_labels') — original points inside the
        pasted boxes removed; sampled points FIRST (reference
        transforms_3d.py:468-470 concat order).
    """
    res = sampler.sample_all(np.asarray(gt_boxes, np.float32),
                             np.asarray(gt_labels))
    if res is None:
        return points, np.asarray(gt_boxes), np.asarray(gt_labels)
    inside = points_in_rbbox(points, res['gt_boxes'])
    points = points[~inside.any(axis=1)]
    spts = res['points']
    if spts.shape[1] < points.shape[1]:
        spts = np.concatenate(
            [spts, np.zeros((len(spts),
                             points.shape[1] - spts.shape[1]),
                            points.dtype)], axis=1)
    points = np.concatenate([spts[:, :points.shape[1]], points], axis=0)
    gt_boxes = np.concatenate(
        [np.asarray(gt_boxes, np.float32).reshape(-1, 7),
         res['gt_boxes']], axis=0)
    gt_labels = np.concatenate([np.asarray(gt_labels),
                                res['gt_labels']], axis=0)
    return points, gt_boxes, gt_labels
