"""Lyft Level-5 perception dataset (LiDAR detection).

Equivalent of the reference's `LyftDataset`
(mmdet3d/datasets/lyft_dataset.py) + `lyft_eval`
(core/evaluation/lyft_eval.py:91-143): nuScenes-style info pkls
(lidar_path / sweeps / cams / gt_boxes (N, 7) lidar frame / gt_names)
and the Kaggle metric — per-class average precision matched by 3D IoU,
averaged over thresholds 0.50:0.95:0.05.

TPU-first: static-shape samples (fixed point count + padded GTs); the
eval is hermetic (no lyft devkit) and reuses the repo's exact rotated
3D-IoU / greedy-matching machinery (evaluation/indoor_eval.py — the
math is frame-agnostic for z-up boxes).
"""

import os
import pickle

import numpy as np

__all__ = ['LyftDataset', 'LYFT_IOU_THRESHOLDS']

LYFT_IOU_THRESHOLDS = tuple(np.arange(0.5, 0.951, 0.05).round(2))


class LyftDataset:
    CLASSES = ('car', 'truck', 'bus', 'emergency_vehicle',
               'other_vehicle', 'motorcycle', 'bicycle', 'pedestrian',
               'animal')

    def __init__(self, data_root, info_path, train=True,
                 max_points=32768, max_gt=64, seed=0,
                 point_features=None, sweeps_num=0):
        self.data_root = data_root
        self.sweeps_num = sweeps_num
        if point_features is None:
            # with sweep accumulation the reference pipeline keeps the
            # time-lag channel (use_dim=[0,1,2,4]); single-sweep uses xyz
            point_features = 4 if sweeps_num else 3
        with open(info_path, 'rb') as f:
            data = pickle.load(f)
        self.infos = data['infos'] if isinstance(data, dict) else data
        self.metadata = data.get('metadata', {}) \
            if isinstance(data, dict) else {}
        self.train = train
        self.max_points = max_points
        self.max_gt = max_gt
        self.point_features = point_features
        self.rng = np.random.RandomState(seed)
        self.cat2label = {c: i for i, c in enumerate(self.CLASSES)}

    def __len__(self):
        return len(self.infos)

    def _load_points(self, info):
        # lyft lidar bins are (x, y, z, intensity, ring) f32
        raw = info['lidar_path']
        candidates = [raw, os.path.join(self.data_root, raw)]
        if 'lyft/' in raw:  # fixture paths relative to another repo
            candidates.append(os.path.join(self.data_root,
                                           raw.split('lyft/')[-1]))
        candidates.append(os.path.join(self.data_root, 'lidar',
                                       os.path.basename(raw)))
        path = next((c for c in candidates if os.path.exists(c)),
                    candidates[-1])
        pts = np.fromfile(path, np.float32).reshape(-1, 5)
        if self.sweeps_num and info.get('sweeps'):
            from .wrappers import multisweep_points
            pts = multisweep_points(
                pts, info, self.data_root, sweeps_num=self.sweeps_num,
                load_dim=5, use_dim=(0, 1, 2, 4), rng=self.rng,
                test_mode=not self.train)
        return pts[:, :self.point_features]

    def _annotations(self, info):
        boxes = np.asarray(info.get('gt_boxes',
                                    np.zeros((0, 7))), np.float32)
        names = [str(n) for n in info.get('gt_names', [])]
        labels = np.asarray([self.cat2label.get(n, -1) for n in names],
                            np.int64)
        keep = labels >= 0
        return boxes[keep], labels[keep]

    def get_cat_ids(self, index):
        """Category ids present in frame `index` (CBGSDataset hook;
        reference nuscenes_dataset.py:154 semantics)."""
        _, labels = self._annotations(self.infos[index])
        return set(int(c) for c in labels)

    def get_sample(self, index):
        info = self.infos[index]
        pts = self._load_points(info)
        boxes, labels = self._annotations(info)
        n = len(pts)
        sel = self.rng.choice(n, self.max_points,
                              replace=n < self.max_points)
        out_pts = pts[sel]
        g = min(len(boxes), self.max_gt)
        gt_boxes = np.zeros((self.max_gt, 7), np.float32)
        gt_labels = np.zeros((self.max_gt,), np.int64)
        gt_mask = np.zeros((self.max_gt,), bool)
        gt_boxes[:g] = boxes[:g]
        gt_labels[:g] = labels[:g]
        gt_mask[:g] = True
        return dict(points=out_pts,
                    point_mask=np.ones((self.max_points,), bool),
                    gt_boxes=gt_boxes, gt_labels=gt_labels,
                    gt_mask=gt_mask)

    def gt_annos(self):
        out = []
        for info in self.infos:
            boxes, labels = self._annotations(info)
            # lyft gt_boxes store gravity-center z; the repo-wide
            # convention is bottom-center
            if len(boxes):
                boxes = boxes.copy()
                boxes[:, 2] -= boxes[:, 5] / 2
            out.append(dict(gt_boxes=boxes, gt_labels=labels))
        return out

    def evaluate(self, results, iou_thresholds=LYFT_IOU_THRESHOLDS):
        """Kaggle Lyft mAP: per-class AP (greedy 3D-IoU matching,
        area-mode PR) averaged over the IoU thresholds
        (reference lyft_eval.py:110-143)."""
        from ..evaluation.indoor_eval import indoor_eval
        label2cat = {i: c for i, c in enumerate(self.CLASSES)}
        res = indoor_eval(self.gt_annos(), results,
                          list(iou_thresholds), label2cat)
        per_thr = [res[f'mAP_{t:.2f}'] for t in iou_thresholds]
        res['mAP_lyft'] = float(np.mean(per_thr))
        return res
