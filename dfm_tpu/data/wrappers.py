"""Dataset wrappers + multi-sweep point loading.

Equivalents of the reference's `CBGSDataset` / `RepeatDataset`
(mmdet3d/datasets/dataset_wrappers.py:1) and
`LoadPointsFromMultiSweeps` (mmdet3d/datasets/pipelines/loading.py:621)
— the pieces that drive its nuScenes / Lyft 10-sweep LiDAR recipes.

Host-side (numpy) by design: resampling indices and sweep IO happen in
the input pipeline; the device only ever sees the static-capacity
padded batches the wrapped dataset already emits.
"""

import os

import numpy as np

__all__ = ['RepeatDataset', 'CBGSDataset', 'multisweep_points']


class RepeatDataset:
    """Repeat a dataset `times` times (epoch-concatenation semantics,
    reference dataset_wrappers via mmdet RepeatDataset)."""

    def __init__(self, dataset, times):
        self.dataset = dataset
        self.times = int(times)
        self._len = len(dataset) * self.times

    def __len__(self):
        return self._len

    def __getattr__(self, name):          # delegate CLASSES, evaluate...
        return getattr(self.dataset, name)

    def get_sample(self, idx, *a, **k):
        return self.dataset.get_sample(idx % len(self.dataset), *a, **k)


def _default_cat_ids(dataset, idx):
    """Category ids present in sample `idx` (fallback when the wrapped
    dataset has no get_cat_ids): reads labels out of its info record."""
    info = dataset.infos[idx]
    if 'annos' in info and 'labels' in info.get('annos', {}):
        labels = np.asarray(info['annos']['labels'])
        return set(int(c) for c in labels[labels >= 0])
    if hasattr(dataset, '_annotations'):
        _, labels = dataset._annotations(info)
        return set(int(c) for c in labels)
    if 'gt_names' in info and hasattr(dataset, 'cat2label'):
        return set(dataset.cat2label[n] for n in info['gt_names']
                   if n in dataset.cat2label)
    return set()


class CBGSDataset:
    """Class-balanced grouping and sampling (Zhu et al. 1908.09492;
    reference mmdet3d/datasets/dataset_wrappers.py:8).

    Duplicates frame indices so every class's expected share of frames
    is 1/num_classes: a frame containing class c enters c's index list;
    each list is resampled to `len * (1/C) / share_c`.
    """

    def __init__(self, dataset, seed=0):
        self.dataset = dataset
        self.CLASSES = getattr(dataset, 'CLASSES', None)
        num_classes = len(self.CLASSES) if self.CLASSES else None
        rng = np.random.RandomState(seed)

        class_sample_idxs = {}
        for idx in range(len(dataset)):
            if hasattr(dataset, 'get_cat_ids'):
                cats = dataset.get_cat_ids(idx)
            else:
                cats = _default_cat_ids(dataset, idx)
            for c in cats:
                class_sample_idxs.setdefault(int(c), []).append(idx)
        if num_classes is None:
            num_classes = max(class_sample_idxs, default=0) + 1
        duplicated = sum(len(v) for v in class_sample_idxs.values())
        self.sample_indices = []
        if duplicated:
            frac = 1.0 / num_classes
            for c, inds in sorted(class_sample_idxs.items()):
                share = len(inds) / duplicated
                take = int(len(inds) * frac / share)
                self.sample_indices += rng.choice(inds, take).tolist()
        if not self.sample_indices:       # no annotations at all
            self.sample_indices = list(range(len(dataset)))

    def __len__(self):
        return len(self.sample_indices)

    def __getattr__(self, name):
        return getattr(self.dataset, name)

    def get_sample(self, idx, *a, **k):
        return self.dataset.get_sample(self.sample_indices[idx], *a, **k)

    def class_histogram(self):
        """Frames per class AFTER balancing (test/diagnostic hook)."""
        hist = {}
        for i in self.sample_indices:
            for c in (self.dataset.get_cat_ids(i)
                      if hasattr(self.dataset, 'get_cat_ids')
                      else _default_cat_ids(self.dataset, i)):
                hist[c] = hist.get(c, 0) + 1
        return hist


def _resolve(path, data_root):
    """Resolve a sweep data_path against the data root (fixture pkls
    often carry paths relative to another checkout)."""
    cands = [path]
    if data_root:
        cands += [os.path.join(data_root, path),
                  os.path.join(data_root, 'lidar',
                               os.path.basename(path))]
    return next((c for c in cands if os.path.exists(c)), cands[-1])


def _remove_close(pts, radius=1.0):
    keep = ~((np.abs(pts[:, 0]) < radius) & (np.abs(pts[:, 1]) < radius))
    return pts[keep]


def multisweep_points(points, info, data_root='', sweeps_num=10,
                      load_dim=5, use_dim=(0, 1, 2, 4), rng=None,
                      pad_empty_sweeps=False, remove_close=False,
                      test_mode=False):
    """Accumulate previous LiDAR sweeps onto the keyframe cloud
    (reference LoadPointsFromMultiSweeps, pipelines/loading.py:621).

    `points`: (N, >=load_dim) keyframe points whose column
    `use_dim[-1]` becomes the time lag (0 for the keyframe).
    `info['sweeps']`: list of dicts with data_path / timestamp /
    sensor2lidar_rotation / sensor2lidar_translation. Sweep points are
    rotated+translated into the keyframe LiDAR frame and stamped with
    `ts - sweep_ts` seconds. Train mode samples `sweeps_num` sweeps
    without replacement; test mode takes the nearest `sweeps_num`.
    """
    rng = rng or np.random
    pts = np.array(points[:, :load_dim], np.float32, copy=True)
    pts[:, use_dim[-1]] = 0.0
    out = [pts]
    ts = float(info.get('timestamp', 0)) / 1e6
    sweeps = info.get('sweeps', []) or []
    if pad_empty_sweeps and not sweeps:
        for _ in range(sweeps_num):
            out.append(_remove_close(pts) if remove_close else pts)
    else:
        if len(sweeps) <= sweeps_num:
            choices = np.arange(len(sweeps))
        elif test_mode:
            choices = np.arange(sweeps_num)
        else:
            choices = rng.choice(len(sweeps), sweeps_num, replace=False)
        for idx in choices:
            sw = sweeps[int(idx)]
            path = _resolve(sw['data_path'], data_root)
            raw = np.fromfile(path, np.float32).reshape(-1, load_dim)
            if remove_close:
                raw = _remove_close(raw)
            raw = raw.copy()
            raw[:, :3] = raw[:, :3] @ np.asarray(
                sw['sensor2lidar_rotation'], np.float32).T
            raw[:, :3] += np.asarray(sw['sensor2lidar_translation'],
                                     np.float32)
            raw[:, use_dim[-1]] = ts - float(sw['timestamp']) / 1e6
            out.append(raw)
    return np.concatenate(out, axis=0)[:, list(use_dim)]
