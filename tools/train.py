#!/usr/bin/env python
"""Train any dfm_tpu config (equivalent of the reference's
tools/train.py:116, which drives every registered detector).

Model + loss dispatch goes through the detector registry
(dfm_tpu/models/builder.py) and the per-family train adapters
(dfm_tpu/runtime/adapters.py), so every config in configs/ — DfM, PGD,
FCOS3D, SMOKE, MonoFlex, SECOND, CenterPoint, VoteNet, ImVoxelNet,
MultiViewDfM — trains from this one CLI.

Data: when the config's dataset files exist on disk the real pipeline
is used (KITTI video pipeline for the DfM family; mono pipelines for
the image families). `--synthetic` (or missing data) trains on
self-consistent random batches from the family adapter — the
data-free train-smoke used by CI.

Usage:
  python tools/train.py configs/dfm_r34_kitti_3class.py \
      --work-dir work_dirs/dfm --cfg-options optimizer.lr=5e-4
  python tools/train.py configs/hv_second_kitti_3class.py \
      --synthetic --max-steps 10

Data parallelism is automatic over all visible devices (one mesh);
resume with --auto-resume.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--work-dir', default='work_dirs/default')
    p.add_argument('--cfg-options', nargs='*', default=None)
    p.add_argument('--auto-resume', action='store_true')
    p.add_argument('--synthetic', action='store_true',
                   help='train on adapter-generated random batches '
                        '(no dataset needed)')
    p.add_argument('--max-steps', type=int, default=None,
                   help='cap total steps (debug)')
    p.add_argument('--eval-samples', type=int, default=None,
                   help='cap val samples per eval (debug)')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--profile-steps', type=int, default=0,
                   help='capture a jax.profiler trace over the first N '
                        'steps (view in TensorBoard / xprof)')
    p.add_argument('--no-tensorboard', action='store_true')
    return p.parse_args()


def build_batch(samples, metas_cls):
    """DfM-family batch from KITTI video-pipeline samples."""
    import jax.numpy as jnp
    keys = set(samples[0])
    stacked = {k: np.stack([s[k] for s in samples]) for k in keys
               if not isinstance(samples[0][k], (str, type(None)))}
    meta = metas_cls(
        ori_cam2img=jnp.asarray(stacked['ori_cam2img']),
        cam2img=jnp.asarray(stacked['cam2img']),
        cur2prev=jnp.asarray(stacked['cur2prev']),
        org_w=jnp.asarray(stacked['org_w']),
        flip=jnp.asarray(stacked['flip']),
        crop_offset=jnp.asarray(stacked['crop_offset']),
        scale_factor=jnp.asarray(stacked['scale_factor']))
    batch = dict(
        img=jnp.asarray(stacked['img']), meta=meta,
        gt_boxes=jnp.asarray(stacked['gt_boxes']),
        gt_labels=jnp.asarray(stacked['gt_labels']),
        gt_mask=jnp.asarray(stacked['gt_mask']),
        depth_img=jnp.asarray(stacked['depth_img']),
        depth_fgmask_img=jnp.asarray(stacked['depth_fgmask_img']))
    for k in ('points', 'point_mask', 'gt_bboxes2d', 'centers2d'):
        if k in stacked:
            batch[k] = jnp.asarray(stacked[k])
    return batch


class SyntheticSource:
    """Adapter-generated random batches (train-smoke, no data)."""

    def __init__(self, handle, adapter, batch_size, seed):
        self.handle, self.adapter = handle, adapter
        self.batch_size, self.seed = batch_size, seed
        self.steps_per_epoch = 16

    def __len__(self):
        return self.steps_per_epoch * self.batch_size

    def next_batch(self, step, rng):
        return self.adapter.synthetic_batch(
            self.handle, self.batch_size, self.seed + step)


class KittiMonoSource:
    """Real KITTI images -> mono-family (FCOS3D/PGD/SMOKE) batches.

    Native infos (data.kitti schema) are adapted per image via
    dfm_tpu.data.kitti_mono.mono_info_from_native (intrinsics + 2D
    boxes rescaled for the configured img_hw resize); the pixels are
    loaded/normalized with load_mono_image.
    """

    def __init__(self, cfg, batch_size, train=True):
        import pickle
        from dfm_tpu.data.kitti_mono import (KittiMonoDataset,
                                             load_mono_image,
                                             mono_info_from_native)
        d = cfg.data
        split = 'train' if train else 'val'
        with open(os.path.join(d.data_root,
                               f'kitti_infos_{split}.pkl'), 'rb') as f:
            infos = pickle.load(f)
        infos = infos['infos'] if isinstance(infos, dict) else infos
        self.img_hw = tuple(d.get('img_hw', (384, 1280)))
        self.ds = KittiMonoDataset(
            [mono_info_from_native(i, d.data_root, self.img_hw)
             for i in infos],
            max_gt=d.get('max_gt', 32))
        self._load = load_mono_image
        self.batch_size = batch_size
        self._cache = {}

    def __len__(self):
        return len(self.ds)

    @property
    def steps_per_epoch(self):
        return max(len(self.ds) // self.batch_size, 1)

    def next_batch(self, step, rng):
        import jax.numpy as jnp
        idxs = [int(i) for i in
                rng.integers(0, len(self.ds), self.batch_size)] \
            if len(self.ds) > self.batch_size else \
            [(step * self.batch_size + k) % len(self.ds)
             for k in range(self.batch_size)]
        samples = []
        for i in idxs:
            s = dict(self.ds.get_sample(i))
            path = s.pop('img_path')
            if path not in self._cache:
                if len(self._cache) > 64:
                    self._cache.clear()
                self._cache[path] = self._load(path, self.img_hw)
            s['img'] = self._cache[path]
            samples.append(s)
        return {k: jnp.asarray(np.stack([s[k] for s in samples]))
                for k in samples[0]}


class KittiDfMSource:
    """Real KITTI video pipeline -> DfM/DfMFull batches."""

    def __init__(self, cfg, batch_size, train=True):
        from dfm_tpu.data.kitti import KittiDataset
        d = cfg.data
        split = 'train' if train else 'val'
        self.ds = KittiDataset(
            d.data_root,
            os.path.join(d.data_root, f'kitti_infos_{split}.pkl'),
            train=train,
            pipeline_kwargs=dict(crop_size=tuple(d.crop_size),
                                 scale_range=tuple(
                                     d.get('scale_range', (1.0, 1.0))),
                                 flip_ratio=d.get('flip_ratio', 0.0),
                                 max_gt=d.max_gt))
        self.batch_size = batch_size
        self.order = None
        self.cursor = 0
        self.epoch_no = -1

    def __len__(self):
        return len(self.ds)

    @property
    def steps_per_epoch(self):
        return max(len(self.ds) // self.batch_size, 1)

    def next_batch(self, step, rng):
        from dfm_tpu.models import BatchMeta
        idxs = []
        while len(idxs) < self.batch_size:
            if self.order is None or self.cursor >= len(self.order):
                self.epoch_no += 1
                self.order = rng.permutation(len(self.ds))
                self.cursor = 0
            idxs.append(int(self.order[self.cursor]))
            self.cursor += 1
        samples = [self.ds.get_sample(i, rng) for i in idxs]
        return build_batch(samples, BatchMeta)


class KittiLidarSource:
    """Real KITTI points -> LiDAR-family batches (SECOND/teacher/
    CenterPoint...), with the reference's cut-and-paste ObjectSample
    when a GT database exists (configs/_base_/datasets/
    kitti-3d-3class.py:10-50 pipeline: ObjectSample -> flip 0.5 ->
    global rot +-pi/4 / scale [0.95, 1.05] -> range filters ->
    shuffle)."""

    SAMPLE_GROUPS = dict(Car=12, Pedestrian=6, Cyclist=6)
    MIN_POINTS = dict(Car=5, Pedestrian=10, Cyclist=10)

    def __init__(self, cfg, batch_size, train=True):
        import pickle
        from dfm_tpu.data.kitti import KittiDataset
        d = cfg.data
        split = 'train' if train else 'val'
        with open(os.path.join(d.data_root,
                               f'kitti_infos_{split}.pkl'), 'rb') as f:
            self.infos = pickle.load(f)
        self.ds = KittiDataset(d.data_root, self.infos, train=train)
        self.max_points = d.get('max_points', 18000)
        self.max_gt = d.get('max_gt', 40)
        self.pcr = np.asarray(cfg.model.get(
            'point_cloud_range', (0, -40, -3, 70.4, 40, 1)), np.float32)
        self.train = train
        self.batch_size = batch_size
        self.sampler = None
        db = os.path.join(d.data_root, 'dfm_gt_database_infos.pkl')
        if train and os.path.exists(db):
            from dfm_tpu.data.dbsampler import DataBaseSampler
            self.sampler = DataBaseSampler(
                db, d.data_root, self.SAMPLE_GROUPS,
                classes=['Car', 'Pedestrian', 'Cyclist'],
                filter_by_min_points=self.MIN_POINTS)
            print(f'[data] ObjectSample GT database: {db}')
        self.order = None
        self.cursor = 0

    def __len__(self):
        return len(self.infos)

    @property
    def steps_per_epoch(self):
        return max(len(self.infos) // self.batch_size, 1)

    def _one(self, idx, rng):
        from dfm_tpu.data.dbsampler import paste_objects
        info = self.infos[idx]
        pts = self.ds._load_points_pl(info)
        boxes = np.asarray(info['annos']['gt_boxes_pl'],
                           np.float32).reshape(-1, 7)
        labels = np.asarray(info['annos']['labels'], np.int64)
        if pts is None:
            pts = np.zeros((1, 3), np.float32)
        if self.train:
            if self.sampler is not None:
                pts, boxes, labels = paste_objects(
                    pts, boxes, labels, self.sampler)
            if rng.random() < 0.5:                 # horizontal flip
                pts[:, 1] = -pts[:, 1]
                boxes[:, 1] = -boxes[:, 1]
                boxes[:, 6] = -boxes[:, 6]
            rot = rng.uniform(-0.78539816, 0.78539816)
            c, s = np.cos(rot), np.sin(rot)
            mat = np.array([[c, -s], [s, c]], np.float32)
            pts[:, :2] = pts[:, :2] @ mat.T
            boxes[:, :2] = boxes[:, :2] @ mat.T
            boxes[:, 6] += rot
            scale = rng.uniform(0.95, 1.05)
            pts[:, :3] *= scale
            boxes[:, :6] *= scale
        pcr = self.pcr
        keep = ((pts[:, 0] >= pcr[0]) & (pts[:, 0] < pcr[3]) &
                (pts[:, 1] >= pcr[1]) & (pts[:, 1] < pcr[4]) &
                (pts[:, 2] >= pcr[2]) & (pts[:, 2] < pcr[5]))
        pts = pts[keep]
        bkeep = ((boxes[:, 0] >= pcr[0]) & (boxes[:, 0] < pcr[3]) &
                 (boxes[:, 1] >= pcr[1]) & (boxes[:, 1] < pcr[4]))
        boxes, labels = boxes[bkeep], labels[bkeep]
        n = len(pts)
        out_pts = np.zeros((self.max_points, 3), np.float32)
        mask = np.zeros((self.max_points,), bool)
        sel = rng.permutation(n)[:self.max_points]
        out_pts[:len(sel)] = pts[sel]
        mask[:len(sel)] = True
        g = min(len(boxes), self.max_gt)
        gt_boxes = np.zeros((self.max_gt, 7), np.float32)
        gt_labels = np.zeros((self.max_gt,), np.int64)
        gt_mask = np.zeros((self.max_gt,), bool)
        gt_boxes[:g] = boxes[:g]
        gt_labels[:g] = labels[:g]
        gt_mask[:g] = True
        return dict(points=out_pts, point_mask=mask, gt_boxes=gt_boxes,
                    gt_labels=gt_labels, gt_mask=gt_mask)

    def next_batch(self, step, rng):
        import jax.numpy as jnp
        idxs = []
        while len(idxs) < self.batch_size:
            if self.order is None or self.cursor >= len(self.order):
                self.order = rng.permutation(len(self.infos))
                self.cursor = 0
            idxs.append(int(self.order[self.cursor]))
            self.cursor += 1
        samples = [self._one(i, rng) for i in idxs]
        return {k: jnp.asarray(np.stack([s[k] for s in samples]))
                for k in samples[0]}


class LyftSource:
    """Lyft LiDAR -> VoxelNet-family batches, with 10-sweep point
    accumulation (data.sweeps_num) and CBGS class-balanced resampling
    (data.cbgs; reference dataset_wrappers.py CBGSDataset — the
    hv_ssn lyft recipe trains through it)."""

    def __init__(self, cfg, batch_size, train=True):
        from dfm_tpu.data.lyft import LyftDataset
        d = cfg.data
        split = 'train' if train else 'val'
        ds = LyftDataset(
            d.data_root,
            os.path.join(d.data_root, f'lyft_infos_{split}.pkl'),
            train=train, max_points=d.get('max_points', 32768),
            max_gt=d.get('max_gt', 64),
            sweeps_num=d.get('sweeps_num', 0))
        if train and d.get('cbgs'):
            from dfm_tpu.data.wrappers import CBGSDataset
            ds = CBGSDataset(ds)
            print(f'[data] CBGS resample: {len(ds.dataset)} -> '
                  f'{len(ds)} frames')
        self.ds = ds
        self.batch_size = batch_size
        self.order = None
        self.cursor = 0

    def __len__(self):
        return len(self.ds)

    @property
    def steps_per_epoch(self):
        return max(len(self.ds) // self.batch_size, 1)

    def next_batch(self, step, rng):
        import jax.numpy as jnp
        idxs = []
        while len(idxs) < self.batch_size:
            if self.order is None or self.cursor >= len(self.order):
                self.order = rng.permutation(len(self.ds))
                self.cursor = 0
            idxs.append(int(self.order[self.cursor]))
            self.cursor += 1
        samples = [self.ds.get_sample(i) for i in idxs]
        return {k: jnp.asarray(np.stack([s[k] for s in samples]))
                for k in samples[0]}


class IndoorSource:
    """SUN RGB-D / ScanNet -> VoteNet-family batches."""

    def __init__(self, cfg, batch_size, train=True):
        from dfm_tpu.data.indoor import ScanNetDataset, SUNRGBDDataset
        d = cfg.data
        cls = {'SUNRGBDDataset': SUNRGBDDataset,
               'ScanNetDataset': ScanNetDataset}[d.type]
        stem = 'sunrgbd' if 'SUNRGBD' in d.type else 'scannet'
        split = 'train' if train else 'val'
        self.ds = cls(d.data_root,
                      os.path.join(d.data_root,
                                   f'{stem}_infos_{split}.pkl'),
                      train=train,
                      num_points=d.get('num_points', None),
                      max_gt=d.get('max_gt', 64))
        self.batch_size = batch_size
        self.order = None
        self.cursor = 0

    def __len__(self):
        return len(self.ds)

    @property
    def steps_per_epoch(self):
        return max(len(self.ds) // self.batch_size, 1)

    def next_batch(self, step, rng):
        import jax.numpy as jnp
        idxs = []
        while len(idxs) < self.batch_size:
            if self.order is None or self.cursor >= len(self.order):
                self.order = rng.permutation(len(self.ds))
                self.cursor = 0
            idxs.append(int(self.order[self.cursor]))
            self.cursor += 1
        samples = [self.ds.get_sample(i) for i in idxs]
        return {k: jnp.asarray(np.stack([s[k] for s in samples]))
                for k in samples[0]}


class SegSource:
    """Seg datasets -> static-shape patch batches (pipeline semantics
    in dfm_tpu/data/seg3d.py; reference IndoorPatchPointSample)."""

    def __init__(self, cfg, batch_size, train=True):
        from dfm_tpu.data.seg3d import build_seg_dataset
        self.ds = build_seg_dataset(cfg.data, train=train)
        self.batch_size = batch_size
        self.cursor = 0

    def __len__(self):
        return len(self.ds)

    @property
    def steps_per_epoch(self):
        return max(len(self.ds) // self.batch_size, 1)

    def next_batch(self, step, rng):
        import jax.numpy as jnp
        # patch sampling is random per __getitem__; scene order cycles
        b = self.ds.batch(self.batch_size, start=self.cursor)
        self.cursor = (self.cursor + self.batch_size) % max(len(self.ds), 1)
        return {k: jnp.asarray(v) for k, v in b.items()}


_INDOOR_INFO = {'SUNRGBDDataset': 'sunrgbd_infos_train.pkl',
                'ScanNetDataset': 'scannet_infos_train.pkl'}


def make_data_source(cfg, handle, adapter, batch_size, args):
    data_root = cfg.data.get('data_root', '') if 'data' in cfg else ''
    dtype_name = cfg.data.get('type', '') if 'data' in cfg else ''
    if dtype_name.endswith('SegDataset'):
        from dfm_tpu.data.seg3d import seg_ann_files
        ann = seg_ann_files(cfg.data, train=True)
        if not args.synthetic and all(os.path.exists(a) for a in ann):
            return SegSource(cfg, batch_size, train=True)
        if not args.synthetic:
            print(f'[data] {ann[0]!r} not found -> synthetic batches')
        return SyntheticSource(handle, adapter, batch_size, args.seed)
    info_file = _INDOOR_INFO.get(dtype_name, 'kitti_infos_train.pkl')
    have_data = bool(data_root) and os.path.exists(
        os.path.join(data_root, info_file))
    if args.synthetic or not have_data:
        if not args.synthetic:
            print(f'[data] {data_root!r} not found -> synthetic '
                  'batches (pass real data or --synthetic to silence)')
        return SyntheticSource(handle, adapter, batch_size, args.seed)
    if handle.type in ('DfM', 'DfMFull'):
        return KittiDfMSource(cfg, batch_size, train=True)
    if dtype_name == 'KittiMono' and handle.type in (
            'FCOSMono3D', 'PGD', 'SMOKEMono3D'):
        # (MonoFlex additionally needs kpts2d/gt_alphas — synthetic only)
        return KittiMonoSource(cfg, batch_size, train=True)
    if dtype_name == 'LyftDataset':
        return LyftSource(cfg, batch_size, train=True)
    if dtype_name in _INDOOR_INFO:
        return IndoorSource(cfg, batch_size, train=True)
    if handle.type in ('VoxelNet', 'DynamicVoxelNet', 'CenterPoint',
                       'SASSD') and dtype_name == 'KittiDataset':
        return KittiLidarSource(cfg, batch_size, train=True)
    print(f'[data] no real-data source wired for {handle.type}; '
          'using synthetic batches')
    return SyntheticSource(handle, adapter, batch_size, args.seed)


def main():
    args = parse_args()
    os.makedirs(args.work_dir, exist_ok=True)

    from dfm_tpu.utils.env import setup_platform
    setup_platform()
    import jax
    import jax.numpy as jnp
    from dfm_tpu.models import build_detector
    from dfm_tpu.parallel import create_mesh, replicate, shard_batch
    from dfm_tpu.runtime import (CheckpointManager, create_train_state,
                                 liga_schedule, make_optimizer,
                                 make_train_step)
    from dfm_tpu.runtime.adapters import get_adapter
    from dfm_tpu.runtime.config import load_config, merge_options

    cfg = merge_options(load_config(args.config), args.cfg_options)
    cfg.dump(os.path.join(args.work_dir, 'config.json'))

    handle = build_detector(cfg.model.to_dict())
    adapter = get_adapter(handle.type)
    model = handle.module
    print(f'[model] {handle.type} via registry')

    mesh = create_mesh()
    n_dev = len(jax.devices())
    d = cfg.get('data', {})
    batch_size = (d.get('batch_size_per_chip', 1) if d else 1) * n_dev

    source = make_data_source(cfg, handle, adapter, batch_size, args)
    steps_per_epoch = getattr(source, 'steps_per_epoch', 16)
    sched_cfg = cfg.get('schedule', {})
    total_epochs = sched_cfg.get('total_epochs', 1) if sched_cfg else 1
    total_steps = steps_per_epoch * total_epochs
    log_interval = sched_cfg.get('log_interval', 50) if sched_cfg else 50

    opt = cfg.get('optimizer', {})
    # the reference freezes the LiDAR teacher (dfm.py:72-75): no
    # updates, no weight decay on the `lidar_teacher` subtree
    frozen = ('lidar_teacher',) if handle.type == 'DfMFull' else ()
    sched = liga_schedule(
        opt.get('lr', 1e-3), opt.get('warmup_iters', 100),
        opt.get('warmup_ratio', 0.1),
        decay_steps=[e * steps_per_epoch
                     for e in opt.get('decay_epochs', (1000,))],
        gamma=opt.get('gamma', 0.1))
    tx = make_optimizer(sched, opt.get('weight_decay', 1e-4),
                        opt.get('grad_clip_norm', 35.0),
                        frozen_prefixes=frozen)

    rng = np.random.default_rng(args.seed)
    batch0 = source.next_batch(0, rng)
    variables = model.init(jax.random.PRNGKey(args.seed),
                           *adapter.model_args(batch0), train=False)

    # converted SECOND-teacher weights (reference `lidar_model` +
    # load_from; tools/model_converters/convert_second_checkpoints.py)
    tck = cfg.model.get('teacher_checkpoint', '')
    if tck and handle.type == 'DfMFull':
        if os.path.exists(tck):
            from dfm_tpu.utils.checkpoint_import import load_msgpack_tree
            tree = load_msgpack_tree(tck)
            variables = dict(variables)
            params = dict(variables['params'])
            params['lidar_teacher'] = tree['params']
            variables['params'] = params
            if 'batch_stats' in tree and tree['batch_stats']:
                bs = dict(variables.get('batch_stats', {}))
                bs['lidar_teacher'] = tree['batch_stats']
                variables['batch_stats'] = bs
            print(f'[teacher] restored from {tck}')
        else:
            print(f'[teacher] {tck!r} not found -> teacher trains from '
                  'random init (set model.teacher_checkpoint)')
    state = create_train_state(variables, tx)

    ck = cfg.get('checkpoint', {})
    ckpt = CheckpointManager(os.path.join(args.work_dir, 'ckpts'),
                             max_keep=ck.get('max_keep', 10) if ck
                             else 10)
    start_step = 0
    if args.auto_resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        start_step = int(state.step)
        print(f'resumed from step {start_step}')

    train_step = make_train_step(
        model, lambda o, bt, r: adapter.loss(handle, o, bt, r),
        model_args_fn=adapter.model_args)

    def run_eval(state):
        """EvalHook equivalent — KITTI eval for the DfM family when val
        data exists (other families evaluate via tools/test.py)."""
        if handle.type not in ('DfM', 'DfMFull') or \
                isinstance(source, SyntheticSource):
            return
        d = cfg.data
        val_info = os.path.join(d.data_root, 'kitti_infos_val.pkl')
        if not os.path.exists(val_info):
            return
        from dfm_tpu.apis import dataset_inference, init_dfm_model
        from dfm_tpu.data.kitti import KittiDataset
        from dfm_tpu.evaluation import kitti_eval
        val_ds = KittiDataset(
            d.data_root, val_info, train=False,
            pipeline_kwargs=dict(crop_size=tuple(d.crop_size),
                                 max_gt=d.max_gt))
        handle_eval = init_dfm_model(handle.cfg, dtype=jnp.float32)
        variables_eval = {'params': state.params,
                          'batch_stats': state.batch_stats}
        n = args.eval_samples or len(val_ds)
        dt_annos = dataset_inference(handle_eval, variables_eval, val_ds,
                                     max_samples=n)
        gt_annos = []
        for info in val_ds.infos[:n]:
            a = info['annos']
            pl = a['gt_boxes_pl']
            gt_annos.append(dict(
                name=np.asarray(a['names']), truncated=a['truncated'],
                occluded=a['occluded'], bbox=a['bbox2d'],
                dimensions=np.stack([pl[:, 3], pl[:, 5], pl[:, 4]], 1),
                location=np.stack([-pl[:, 1], -pl[:, 2], pl[:, 0]], 1),
                rotation_y=-pl[:, 6] - np.pi / 2))
        res = kitti_eval(gt_annos, dt_annos)
        for k in sorted(res):
            if '3d_moderate' in k:
                print(f'[eval] {k}: {res[k]:.4f}', flush=True)

    from dfm_tpu.runtime.logging import MetricsLogger, profile_trace
    logger = MetricsLogger(args.work_dir,
                           use_tensorboard=not args.no_tensorboard)

    # multi-host: every process loads only its shard of each epoch and
    # contributes its slice of the global batch
    # (dfm_tpu/parallel/multihost.py; single-host degenerates cleanly)
    from dfm_tpu.parallel.multihost import (broadcast_seed,
                                            global_batch_from_local)
    multi_host = jax.process_count() > 1
    seed = broadcast_seed(args.seed)

    with mesh:
        state = replicate(state, mesh)
        key = jax.random.PRNGKey(seed)
        t0 = time.time()
        step = start_step
        max_steps = args.max_steps or total_steps
        ck_interval = (ck.get('interval_epochs', 1) if ck else 1) \
            * steps_per_epoch
        eval_interval = (sched_cfg.get('eval_interval', 1)
                         if sched_cfg else 1) * steps_per_epoch
        profiling = args.profile_steps > 0
        prof_ctx = profile_trace(args.work_dir, enabled=profiling)
        if profiling:
            prof_ctx.__enter__()
        while step < max_steps:
            local = source.next_batch(step, rng)
            batch = global_batch_from_local(local, mesh) if multi_host \
                else shard_batch(local, mesh)
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batch, sub)
            step += 1
            if profiling and step - start_step >= args.profile_steps:
                jax.block_until_ready(metrics)
                prof_ctx.__exit__(None, None, None)
                profiling = False
                print(f'profile trace saved to {args.work_dir}/profile')
            if step % log_interval == 0 or step == 1:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t0
                m['s_per_iter'] = dt / max(step - start_step, 1)
                logger.log(step, m)
                print(f'step {step}/{max_steps} '
                      f'({m["s_per_iter"]:.2f}s/it) ' +
                      ' '.join(f'{k}={v:.4f}' for k, v in m.items()),
                      flush=True)
            if step % ck_interval == 0:
                ckpt.save(step, jax.device_get(state))
                if step % eval_interval == 0:
                    run_eval(state)
        ckpt.save(step, jax.device_get(state), force=True)
    logger.close()
    print('training done')


if __name__ == '__main__':
    main()
