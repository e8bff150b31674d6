"""Point-cloud semantic-segmentation datasets (S3DIS / ScanNet /
SemanticKITTI).

Equivalents of the reference's `Custom3DSegDataset`
(mmdet3d/datasets/custom_3d_seg.py:20-465), `S3DISSegDataset`
(s3dis_dataset.py:157-445), `ScanNetSegDataset`
(scannet_dataset.py:257-430) and `SemanticKITTIDataset`
(semantickitti_dataset.py:9-110), reading the same `*_infos.pkl` +
`points/*.bin` + `semantic_mask/*.bin` layout the reference's
create_data tooling produces (mini fixtures checked into its
tests/data/{s3dis,scannet,semantickitti}).

TPU-first: training samples are STATIC-shape patches of exactly
`num_points` points (the reference's `IndoorPatchPointSample`,
pipelines/transforms_3d.py:1268-1496, re-done as host numpy), labels
are remapped through a lookup table (`PointSegClassMapping`,
pipelines/transforms_3d.py:1499-1540), and test mode hands whole
scenes to `models.segmentors.slide_inference`.
"""

import os
import pickle

import numpy as np

__all__ = ['seg_class_lookup', 'patch_point_sample', 'Seg3DDataset',
           'S3DISSegDataset', 'ScanNetSegDataset',
           'SemanticKITTISegDataset']


def seg_class_lookup(valid_cat_ids, max_cat_id, ignore_index):
    """PointSegClassMapping as a lookup array: raw category id ->
    train id, everything not in `valid_cat_ids` -> ignore_index
    (reference transforms_3d.py:1499-1540)."""
    lut = np.full(int(max_cat_id) + 1, ignore_index, np.int64)
    for i, cid in enumerate(valid_cat_ids):
        lut[int(cid)] = i
    return lut


def patch_point_sample(rng, coords, sem_mask, num_points, block_size=1.0,
                       ignore_index=None, num_try=10, enlarge_size=0.2,
                       min_unique_num=None, eps=1e-2):
    """IndoorPatchPointSample: pick a valid block-sized xy patch around
    a random point, then sample exactly `num_points` indices from it
    (reference transforms_3d.py:1371-1469; same validity criteria:
    PointNet++ 31x31x62 occupancy >= 2% and >= 70% annotated).

    Returns (choices (num_points,), patch_center (3,))."""
    coord_max = coords.max(axis=0)
    coord_min = coords.min(axis=0)
    point_idxs = cur_center = None
    for _ in range(num_try):
        cur_center = coords[rng.randint(coords.shape[0])]
        cur_max = cur_center + np.array([block_size / 2,
                                         block_size / 2, 0.0])
        cur_min = cur_center - np.array([block_size / 2,
                                         block_size / 2, 0.0])
        cur_max[2], cur_min[2] = coord_max[2], coord_min[2]
        sel = ((coords >= cur_min - enlarge_size)
               & (coords <= cur_max + enlarge_size)).all(axis=1)
        if not sel.any():
            continue
        cur_coords = coords[sel]
        point_idxs = np.where(sel)[0]
        inner = ((cur_coords >= cur_min - eps)
                 & (cur_coords <= cur_max + eps)).all(axis=1)
        if min_unique_num is None:
            ext = np.maximum(cur_max - cur_min, 1e-6)
            vidx = np.ceil((cur_coords[inner] - cur_min) / ext
                           * np.array([31.0, 31.0, 62.0]))
            vidx = np.unique(vidx[:, 0] * 31 * 62 + vidx[:, 1] * 62
                             + vidx[:, 2])
            flag1 = len(vidx) / (31.0 * 31.0 * 62.0) >= 0.02
        else:
            flag1 = inner.sum() >= min_unique_num
        if ignore_index is None:
            flag2 = True
        else:
            flag2 = (np.sum(sem_mask[sel] != ignore_index)
                     / max(len(point_idxs), 1)) >= 0.7
        if flag1 and flag2:
            break
    if point_idxs is None:       # degenerate tiny scene: use everything
        point_idxs = np.arange(coords.shape[0])
        cur_center = coords.mean(axis=0)
    if point_idxs.size >= num_points:
        choices = rng.choice(point_idxs, num_points, replace=False)
    else:
        dup = rng.choice(point_idxs.size, num_points - point_idxs.size)
        choices = point_idxs[np.concatenate(
            [np.arange(point_idxs.size), dup])]
    return choices, cur_center


class Seg3DDataset:
    """Base seg dataset: static-shape training patches + whole-scene
    test access + hermetic mIoU evaluation.

    Subclasses set CLASSES / VALID_CLASS_IDS / ALL_CLASS_IDS / PALETTE
    and may override `_load_points` / `_load_mask`.
    """
    CLASSES = ()
    VALID_CLASS_IDS = ()
    ALL_CLASS_IDS = ()
    PALETTE = None
    # reference per-dataset loading defaults
    load_dim = 6
    use_color = True

    def __init__(self, data_root, ann_files, train=True, num_points=4096,
                 block_size=1.0, use_normalized_coord=True,
                 ignore_index=None, scene_idxs=None, seed=0,
                 test_batch_size=8, sample_rate=0.5):
        self.data_root = data_root
        self.train = train
        self.num_points = num_points
        self.block_size = block_size
        self.use_normalized_coord = use_normalized_coord
        self.sample_rate = sample_rate
        self.test_batch_size = test_batch_size
        self.ignore_index = len(self.CLASSES) if ignore_index is None \
            else ignore_index
        self.lut = seg_class_lookup(self.VALID_CLASS_IDS,
                                    max(self.ALL_CLASS_IDS),
                                    self.ignore_index)
        if isinstance(ann_files, str):
            ann_files = [ann_files]
        self.infos = []
        for f in ann_files:
            with open(f, 'rb') as fh:
                self.infos.extend(pickle.load(fh))
        self.rng = np.random.RandomState(seed)
        # scene_idxs: resampling of scenes proportional to point count
        # (custom_3d_seg.py:265-285); identity when not provided.
        if not train or scene_idxs is None:
            self.scene_idxs = np.arange(len(self.infos), dtype=np.int32)
        else:
            self.scene_idxs = np.asarray(scene_idxs, np.int32)

    def __len__(self):
        return len(self.scene_idxs)

    @property
    def label2cat(self):
        return {i: c for i, c in enumerate(self.CLASSES)}

    # -- raw IO -------------------------------------------------------------
    def _load_points(self, info):
        path = os.path.join(self.data_root, info['pts_path'])
        pts = np.fromfile(path, np.float32).reshape(-1, self.load_dim)
        if not self.use_color:
            pts = pts[:, :3]
        return pts

    def _load_mask(self, info, n):
        path = os.path.join(self.data_root,
                            info['pts_semantic_mask_path'])
        mask = np.fromfile(path, np.int64)
        return self.lut[np.clip(mask, 0, len(self.lut) - 1)]

    def load_scene(self, idx):
        """Whole scene: (points (N, 3+C) with color normalized to
        [0, 1], labels (N,))."""
        info = self.infos[idx]
        pts = self._load_points(info)
        labels = self._load_mask(info, pts.shape[0])
        if self.use_color and pts.shape[1] >= 6:
            pts = pts.copy()
            pts[:, 3:6] /= 255.0     # NormalizePointsColor(color_mean=None)
        return pts, labels

    # -- training samples ----------------------------------------------------
    def __getitem__(self, i):
        idx = int(self.scene_idxs[i % len(self.scene_idxs)])
        pts, labels = self.load_scene(idx)
        if not self.train:
            return dict(points=pts.astype(np.float32),
                        seg_labels=labels.astype(np.int32),
                        sample_idx=idx)
        choices, center = patch_point_sample(
            self.rng, pts[:, :3], labels, self.num_points,
            self.block_size, ignore_index=self.ignore_index)
        coords = pts[choices, :3]
        feats = pts[choices, 3:]
        cc = coords.copy()
        cc[:, :2] -= center[:2]
        if self.use_normalized_coord:
            ext = np.maximum(pts[:, :3].max(axis=0), 1e-6)
            feats = np.concatenate([feats, coords / ext], axis=1)
        sample = np.concatenate([cc, feats], axis=1)
        return dict(points=sample.astype(np.float32),
                    seg_labels=labels[choices].astype(np.int32),
                    sample_idx=idx)

    def batch(self, b, start=0):
        """Stack `b` consecutive training samples (static shapes)."""
        items = [self[start + j] for j in range(b)]
        return dict(
            points=np.stack([it['points'] for it in items]),
            seg_labels=np.stack([it['seg_labels'] for it in items]))

    # -- evaluation ----------------------------------------------------------
    def evaluate(self, results):
        """results: list of per-scene (N_i,) predicted label arrays in
        dataset order (custom_3d_seg.py:310-380 -> seg_eval)."""
        from ..evaluation.seg_eval import seg_eval
        gts = [self.load_scene(i)[1] for i in range(len(self.infos))]
        return seg_eval(gts, results, self.label2cat,
                        ignore_index=self.ignore_index)


class S3DISSegDataset(Seg3DDataset):
    """S3DIS seg (s3dis_dataset.py:157-445): 13 classes, xyzrgb points,
    multi-area `ann_files` concatenation."""
    CLASSES = ('ceiling', 'floor', 'wall', 'beam', 'column', 'window',
               'door', 'table', 'chair', 'sofa', 'bookcase', 'board',
               'clutter')
    VALID_CLASS_IDS = tuple(range(13))
    ALL_CLASS_IDS = tuple(range(14))
    PALETTE = [[0, 255, 0], [0, 0, 255], [0, 255, 255], [255, 255, 0],
               [255, 0, 255], [100, 100, 255], [200, 200, 100],
               [170, 120, 200], [255, 0, 0], [200, 100, 100],
               [10, 200, 100], [200, 200, 200], [50, 50, 50]]


class ScanNetSegDataset(Seg3DDataset):
    """ScanNet seg (scannet_dataset.py:257-430): 20 nyu40 classes."""
    CLASSES = ('wall', 'floor', 'cabinet', 'bed', 'chair', 'sofa',
               'table', 'door', 'window', 'bookshelf', 'picture',
               'counter', 'desk', 'curtain', 'refrigerator',
               'showercurtrain', 'toilet', 'sink', 'bathtub',
               'otherfurniture')
    VALID_CLASS_IDS = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16,
                       24, 28, 33, 34, 36, 39)
    ALL_CLASS_IDS = tuple(range(41))


class SemanticKITTISegDataset(Seg3DDataset):
    """SemanticKITTI (semantickitti_dataset.py:9-110): outdoor LiDAR
    scans (x, y, z, intensity), 20 classes incl. 'unlabeled'; labels
    are the lower 16 bits of the uint32 .label words. The reference
    consumes the raw ids as-is (its fixture test, no learning map);
    here the standard semantic-kitti learning map is applied so ids
    match `CLASSES` order."""
    CLASSES = ('unlabeled', 'car', 'bicycle', 'motorcycle', 'truck',
               'bus', 'person', 'bicyclist', 'motorcyclist', 'road',
               'parking', 'sidewalk', 'other-ground', 'building',
               'fence', 'vegetation', 'trunck', 'terrian', 'pole',
               'traffic-sign')
    # semantic-kitti.yaml learning_map (api repo), mapped onto the
    # reference's 20-name class list above
    LEARNING_MAP = {
        0: 0, 1: 0, 10: 1, 11: 2, 13: 5, 15: 3, 16: 5, 18: 4, 20: 5,
        30: 6, 31: 7, 32: 8, 40: 9, 44: 10, 48: 11, 49: 12, 50: 13,
        51: 14, 52: 0, 60: 9, 70: 15, 71: 16, 72: 17, 80: 18, 81: 19,
        99: 0, 252: 1, 253: 7, 254: 6, 255: 8, 256: 5, 257: 5, 258: 4,
        259: 5}
    VALID_CLASS_IDS = tuple(range(20))
    ALL_CLASS_IDS = tuple(range(20))
    load_dim = 4
    use_color = False

    def __init__(self, *args, **kwargs):
        kwargs.setdefault('use_normalized_coord', False)
        kwargs.setdefault('block_size', 50.0)
        # class 0 = 'unlabeled' is the ignored label (semantic-kitti
        # evaluates the 19 real classes)
        kwargs.setdefault('ignore_index', 0)
        super().__init__(*args, **kwargs)
        lut = np.zeros(max(self.LEARNING_MAP) + 1, np.int64)
        for k, v in self.LEARNING_MAP.items():
            lut[k] = v
        self._label_lut = lut

    def _load_points(self, info):
        path = os.path.join(self.data_root, info['pts_path'])
        return np.fromfile(path, np.float32).reshape(-1, self.load_dim)

    def _load_mask(self, info, n):
        path = os.path.join(self.data_root,
                            info['pts_semantic_mask_path'])
        raw = np.fromfile(path, np.uint32) & 0xFFFF
        return self._label_lut[np.clip(raw, 0,
                                       len(self._label_lut) - 1)]


_SEG_DATASETS = {
    'S3DISSegDataset': S3DISSegDataset,
    'ScanNetSegDataset': ScanNetSegDataset,
    'SemanticKITTISegDataset': SemanticKITTISegDataset,
}


def seg_ann_files(d, train=True):
    """Resolve the info-pkl paths a seg data config points at (with
    fallbacks to the reference's fixture naming, tests/data/*)."""
    root = d.get('data_root', '')
    t = d.get('type', '')
    if t == 'S3DISSegDataset':
        areas = d.get('train_areas', (1, 2, 3, 4, 6)) if train \
            else (d.get('test_area', 5),)
        ann = [os.path.join(root, f's3dis_infos_Area_{a}.pkl')
               for a in areas]
        single = os.path.join(root, 's3dis_infos.pkl')
    elif t == 'ScanNetSegDataset':
        split = 'train' if train else 'val'
        ann = [os.path.join(root, f'scannet_infos_{split}.pkl')]
        single = os.path.join(root, 'scannet_infos.pkl')
    elif t == 'SemanticKITTISegDataset':
        split = 'train' if train else 'val'
        ann = [os.path.join(root, f'semantickitti_infos_{split}.pkl')]
        single = os.path.join(root, 'semantickitti_infos.pkl')
    else:
        raise KeyError(f'not a seg dataset type: {t!r}')
    if not all(os.path.exists(a) for a in ann) and os.path.exists(single):
        ann = [single]
    return ann


def build_seg_dataset(d, train=True, **over):
    """Config data dict -> a Seg3DDataset (train patches or test
    scenes)."""
    cls = _SEG_DATASETS[d.get('type')]
    kw = dict(num_points=d.get('num_points', 4096), train=train)
    for k in ('block_size', 'use_normalized_coord', 'ignore_index',
              'sample_rate', 'test_batch_size'):
        if d.get(k) is not None:
            kw[k] = d.get(k)
    kw.update(over)
    return cls(d.get('data_root', ''), seg_ann_files(d, train), **kw)
