"""nuScenes monocular dataset + detection metrics (pure numpy).

Equivalent of the reference's inherited `NuScenesMonoDataset`
(mmdet3d/datasets/nuscenes_mono_dataset.py; COCO-style per-camera
mono annotations with attributes + velocities) and the official
nuscenes-devkit detection metrics its `evaluate` shells out to:
center-distance matching at {0.5, 1, 2, 4} m, class-wise AP averaged
over thresholds, the five TP errors (ATE/ASE/AOE/AVE/AAE), and the
NDS composite. The devkit itself is an optional import used only by
the raw-data converter; evaluation is hermetic numpy.

Info layout (one dict per image):
    token, img_path, cam2img (3x3 or 4x4), width, height,
    gt_boxes (G, 9) [x, y, z, w, l, h, yaw, vx, vy] GLOBAL-frame
    gravity-center boxes, gt_names (G,), gt_attrs (G,) int.
"""

import os
import pickle

import numpy as np

__all__ = ['NUS_CLASSES', 'NUS_ATTRS', 'NuScenesDataset',
           'NuScenesMonoDataset', 'nuscenes_detection_metrics']

NUS_CLASSES = ('car', 'truck', 'trailer', 'bus', 'construction_vehicle',
               'bicycle', 'motorcycle', 'pedestrian', 'traffic_cone',
               'barrier')
NUS_ATTRS = ('cycle.with_rider', 'cycle.without_rider',
             'pedestrian.moving', 'pedestrian.standing',
             'pedestrian.sitting_lying_down', 'vehicle.moving',
             'vehicle.parked', 'vehicle.stopped', 'None')

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD = 2.0          # TP metrics use the 2 m matches
MIN_RECALL = 0.1
MIN_PRECISION = 0.1


class NuScenesMonoDataset:
    """Info-pkl backed mono dataset (reference load_annotations
    analog); `get_sample` returns image + GT arrays for training and
    the raw info for evaluation."""

    def __init__(self, data_root, ann_file='nuscenes_infos_mono.pkl',
                 classes=NUS_CLASSES, max_gt=48):
        self.data_root = data_root
        self.classes = list(classes)
        self.max_gt = max_gt
        path = os.path.join(data_root, ann_file)
        with open(path, 'rb') as f:
            self.infos = pickle.load(f)

    def __len__(self):
        return len(self.infos)

    def get_cat_ids(self, idx):
        """Category ids present in sample `idx` (CBGSDataset hook;
        reference nuscenes_dataset.py:154)."""
        return set(self.classes.index(n)
                   for n in self.infos[idx]['gt_names']
                   if n in self.classes)

    def evaluate(self, results):
        """Per-sample padded detections -> NDS metric dict (reference
        NuScenesDataset.evaluate -> nuscenes devkit; hermetic
        reimplementation in `nuscenes_detection_metrics`).

        `results[i]`: dict with 'boxes' (N, 9) [x,y,z,w,l,h,yaw,vx,vy],
        'scores' (N,), 'labels' (N,), optional 'attrs', optional
        'mask' to drop padding rows."""
        preds, gts = [], []
        for info, det in zip(self.infos, results):
            m = np.asarray(det.get(
                'mask', np.ones(len(det['scores']), bool))).astype(bool)
            preds.append(dict(
                boxes=np.asarray(det['boxes'])[m],
                scores=np.asarray(det['scores'])[m],
                labels=np.asarray(det['labels'])[m],
                attrs=np.asarray(det['attrs'])[m]
                if det.get('attrs') is not None else None))
            labels = np.asarray(
                [self.classes.index(n) if n in self.classes else -1
                 for n in info['gt_names']], np.int64)
            keep = labels >= 0
            boxes = np.asarray(info['gt_boxes'],
                               np.float32).reshape(-1, 9)[keep]
            gt = dict(boxes=boxes, labels=labels[keep])
            if 'gt_attrs' in info:
                gt['attrs'] = np.asarray(info['gt_attrs'])[keep]
            gts.append(gt)
        return nuscenes_detection_metrics(preds, gts,
                                          classes=self.classes)

    def get_sample(self, idx, rng=None):
        import cv2
        info = self.infos[idx]
        img = cv2.imread(os.path.join(self.data_root, info['img_path']))
        boxes = np.asarray(info['gt_boxes'], np.float32).reshape(-1, 9)
        labels = np.asarray(
            [self.classes.index(n) if n in self.classes else -1
             for n in info['gt_names']], np.int64)
        keep = labels >= 0
        g = int(keep.sum())
        out_boxes = np.zeros((self.max_gt, 9), np.float32)
        out_labels = np.zeros((self.max_gt,), np.int64)
        out_attrs = np.full((self.max_gt,), len(NUS_ATTRS) - 1, np.int64)
        out_boxes[:g] = boxes[keep][:self.max_gt]
        out_labels[:g] = labels[keep][:self.max_gt]
        attrs = np.asarray(info.get('gt_attrs',
                                    np.zeros(len(labels))), np.int64)
        out_attrs[:g] = attrs[keep][:self.max_gt]
        mask = np.arange(self.max_gt) < g
        return dict(img=img, cam2img=np.asarray(info['cam2img'],
                                                np.float32),
                    gt_boxes=out_boxes, gt_labels=out_labels,
                    gt_attrs=out_attrs, gt_mask=mask, info=info)


class NuScenesDataset:
    """LiDAR-side nuScenes dataset over `create_nuscenes_infos` pkls
    (reference mmdet3d/datasets/nuscenes_dataset.py): nuScenes-style
    info layout (lidar_path / sweeps / cams / gt_boxes (N, 7)
    gravity-center lidar frame / gt_names / gt_velocity (N, 2) /
    valid_flag), multi-sweep point accumulation, CBGS hook, and the
    hermetic NDS evaluation above. Static-shape samples (fixed point
    count + padded GTs) like `LyftDataset`."""

    CLASSES = NUS_CLASSES

    def __init__(self, data_root, info_path, train=True,
                 max_points=32768, max_gt=64, seed=0,
                 point_features=None, sweeps_num=0,
                 use_valid_flag=True):
        self.data_root = data_root
        self.sweeps_num = sweeps_num
        if point_features is None:
            # the reference pipeline keeps xyz + intensity + time-lag
            # (use_dim=[0,1,2,3,4] with sweeps; [0,1,2,3] single)
            point_features = 5 if sweeps_num else 4
        with open(info_path, 'rb') as f:
            data = pickle.load(f)
        self.infos = data['infos'] if isinstance(data, dict) else data
        self.metadata = data.get('metadata', {}) \
            if isinstance(data, dict) else {}
        self.train = train
        self.max_points = max_points
        self.max_gt = max_gt
        self.point_features = point_features
        self.use_valid_flag = use_valid_flag
        self.rng = np.random.RandomState(seed)
        self.cat2label = {c: i for i, c in enumerate(self.CLASSES)}

    def __len__(self):
        return len(self.infos)

    def _load_points(self, info):
        # nuScenes lidar bins are (x, y, z, intensity, ring) f32
        raw = info['lidar_path']
        candidates = [raw, os.path.join(self.data_root, raw)]
        if 'nuscenes/' in raw:  # fixture paths relative to another repo
            candidates.append(os.path.join(
                self.data_root, raw.split('nuscenes/')[-1]))
        path = next((c for c in candidates if os.path.exists(c)),
                    candidates[-1])
        pts = np.fromfile(path, np.float32).reshape(-1, 5)
        if self.sweeps_num and info.get('sweeps'):
            from .wrappers import multisweep_points
            pts = multisweep_points(
                pts, info, self.data_root, sweeps_num=self.sweeps_num,
                load_dim=5, use_dim=(0, 1, 2, 3, 4), rng=self.rng,
                test_mode=not self.train)
        return pts[:, :self.point_features]

    def _annotations(self, info):
        boxes = np.asarray(info.get('gt_boxes',
                                    np.zeros((0, 7))), np.float32)
        names = [str(n) for n in info.get('gt_names', [])]
        labels = np.asarray([self.cat2label.get(n, -1) for n in names],
                            np.int64)
        velo = np.asarray(info.get('gt_velocity',
                                   np.zeros((len(names), 2))),
                          np.float32)
        velo = np.nan_to_num(velo)
        keep = labels >= 0
        if self.use_valid_flag and 'valid_flag' in info:
            keep &= np.asarray(info['valid_flag'], bool)
        return boxes[keep], labels[keep], velo[keep]

    def get_cat_ids(self, index):
        """Category ids present in frame `index` (CBGSDataset hook;
        reference nuscenes_dataset.py:154)."""
        _, labels, _ = self._annotations(self.infos[index])
        return set(int(c) for c in labels)

    def get_sample(self, index):
        info = self.infos[index]
        pts = self._load_points(info)
        boxes, labels, velo = self._annotations(info)
        n = len(pts)
        sel = self.rng.choice(n, self.max_points,
                              replace=n < self.max_points)
        g = min(len(boxes), self.max_gt)
        gt_boxes = np.zeros((self.max_gt, 7), np.float32)
        gt_velocity = np.zeros((self.max_gt, 2), np.float32)
        gt_labels = np.zeros((self.max_gt,), np.int64)
        gt_mask = np.zeros((self.max_gt,), bool)
        gt_boxes[:g] = boxes[:g]
        gt_velocity[:g] = velo[:g]
        gt_labels[:g] = labels[:g]
        gt_mask[:g] = True
        return dict(points=pts[sel],
                    point_mask=np.ones((self.max_points,), bool),
                    gt_boxes=gt_boxes, gt_velocity=gt_velocity,
                    gt_labels=gt_labels, gt_mask=gt_mask)

    def evaluate(self, results):
        """Per-sample detections (lidar frame) -> hermetic NDS dict.

        `results[i]`: dict with 'boxes' (N, 7) or (N, 9 incl. vx, vy),
        'scores', 'labels', optional 'mask'."""
        preds, gts = [], []
        for info, det in zip(self.infos, results):
            m = np.asarray(det.get(
                'mask', np.ones(len(det['scores']), bool))).astype(bool)
            b = np.asarray(det['boxes'], np.float32)[m]
            if b.shape[1] == 7:
                b = np.concatenate(
                    [b, np.zeros((len(b), 2), np.float32)], axis=1)
            preds.append(dict(boxes=b,
                              scores=np.asarray(det['scores'])[m],
                              labels=np.asarray(det['labels'])[m],
                              attrs=None))
            boxes, labels, velo = self._annotations(info)
            gts.append(dict(
                boxes=np.concatenate([boxes, velo], axis=1),
                labels=labels))
        return nuscenes_detection_metrics(preds, gts,
                                          classes=list(self.CLASSES))


def _ap_from_matches(scores, matched, num_gt):
    """nuScenes AP: normalized area of the P-R curve above the
    (0.1, 0.1) operating floor (devkit average_precision)."""
    if num_gt == 0 or len(scores) == 0:
        return 0.0
    order = np.argsort(-np.asarray(scores))
    tp = np.asarray(matched, np.float64)[order]
    fp = 1.0 - tp
    tp_c = np.cumsum(tp)
    fp_c = np.cumsum(fp)
    recall = tp_c / num_gt
    precision = tp_c / np.maximum(tp_c + fp_c, 1e-9)
    # 101-point interpolation on the recall grid (devkit)
    r_grid = np.linspace(0, 1, 101)
    p_interp = np.zeros_like(r_grid)
    for i, r in enumerate(r_grid):
        sel = recall >= r
        p_interp[i] = precision[sel].max() if sel.any() else 0.0
    p = p_interp[r_grid >= MIN_RECALL]
    p = np.clip(p - MIN_PRECISION, 0, 1)
    return float(p.sum() / ((1 - MIN_RECALL - MIN_PRECISION) * 101))


def _greedy_match(pred_xy, pred_scores, gt_xy, thr):
    """Score-descending greedy center-distance matching (devkit
    accumulate): returns matched flags + matched gt index (-1)."""
    order = np.argsort(-pred_scores)
    taken = np.zeros(len(gt_xy), bool)
    matched = np.zeros(len(pred_xy), bool)
    match_idx = np.full(len(pred_xy), -1, np.int64)
    for i in order:
        if len(gt_xy) == 0:
            break
        d = np.linalg.norm(gt_xy - pred_xy[i], axis=1)
        d[taken] = np.inf
        j = int(np.argmin(d))
        if d[j] <= thr:
            taken[j] = True
            matched[i] = True
            match_idx[i] = j
    return matched, match_idx


def _angle_diff(a, b, period=2 * np.pi):
    d = (a - b) % period
    return np.abs(np.where(d > period / 2, d - period, d))


def nuscenes_detection_metrics(predictions, ground_truths,
                               classes=NUS_CLASSES):
    """Hermetic devkit-style metrics.

    Args:
        predictions: per-sample list of dicts with 'boxes' (N, 9)
            [x,y,z,w,l,h,yaw,vx,vy], 'scores' (N,), 'labels' (N,),
            optional 'attrs' (N,).
        ground_truths: per-sample list of dicts with 'boxes' (G, 9),
            'labels' (G,), optional 'attrs' (G,).

    Returns:
        dict with per-class AP, mAP, TP errors, and NDS.
    """
    results = {}
    aps = []
    tp_errs = {k: [] for k in ('trans_err', 'scale_err', 'orient_err',
                               'vel_err', 'attr_err')}
    for ci, cname in enumerate(classes):
        cls_aps = []
        for thr in DIST_THRESHOLDS:
            scores_all, match_all, num_gt = [], [], 0
            for pred, gt in zip(predictions, ground_truths):
                pm = np.asarray(pred['labels']) == ci
                gm = np.asarray(gt['labels']) == ci
                num_gt += int(gm.sum())
                p_boxes = np.asarray(pred['boxes'])[pm]
                p_scores = np.asarray(pred['scores'])[pm]
                g_boxes = np.asarray(gt['boxes'])[gm]
                matched, midx = _greedy_match(
                    p_boxes[:, :2], p_scores, g_boxes[:, :2], thr)
                scores_all.extend(p_scores.tolist())
                match_all.extend(matched.tolist())
                if thr == TP_THRESHOLD and matched.any():
                    mi = midx[matched]
                    pb, gb = p_boxes[matched], g_boxes[mi]
                    tp_errs['trans_err'].extend(
                        np.linalg.norm(pb[:, :2] - gb[:, :2], axis=1))
                    # scale: 1 - 3D IoU of aligned boxes
                    inter = np.prod(np.minimum(pb[:, 3:6], gb[:, 3:6]),
                                    axis=1)
                    union = np.prod(pb[:, 3:6], 1) + \
                        np.prod(gb[:, 3:6], 1) - inter
                    tp_errs['scale_err'].extend(1 - inter / union)
                    period = np.pi if cname == 'barrier' else 2 * np.pi
                    tp_errs['orient_err'].extend(
                        _angle_diff(pb[:, 6], gb[:, 6], period))
                    if pb.shape[1] >= 9 and gb.shape[1] >= 9:
                        tp_errs['vel_err'].extend(np.linalg.norm(
                            pb[:, 7:9] - gb[:, 7:9], axis=1))
                    if 'attrs' in pred and 'attrs' in gt:
                        pa = np.asarray(pred['attrs'])[pm][matched]
                        ga = np.asarray(gt['attrs'])[gm][mi]
                        tp_errs['attr_err'].extend(
                            (pa != ga).astype(np.float64))
            cls_aps.append(_ap_from_matches(scores_all, match_all,
                                            num_gt))
        ap = float(np.mean(cls_aps))
        results[f'{cname}_AP'] = ap
        aps.append(ap)
    results['mAP'] = float(np.mean(aps))
    # TP scores: 1 - min(1, err / norm) (devkit: ATE/AVE raw meters,
    # ASE/AAE in [0,1], AOE radians; NDS normalizers)
    tp_scores = []
    for k, norm in (('trans_err', 1.0), ('scale_err', 1.0),
                    ('orient_err', np.pi), ('vel_err', 1.0),
                    ('attr_err', 1.0)):
        err = float(np.mean(tp_errs[k])) if tp_errs[k] else 1.0
        results[f'm{k.upper()}'] = err
        tp_scores.append(max(0.0, 1.0 - min(1.0, err / norm)))
    results['NDS'] = float((5 * results['mAP'] + sum(tp_scores)) / 10)
    return results
