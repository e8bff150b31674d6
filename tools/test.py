#!/usr/bin/env python
"""Evaluate any dfm_tpu config (equivalent of the reference's
tools/test.py:130, which drives every registered detector).

Model + predict dispatch goes through the detector registry and the
per-family adapters, so every config evaluates from this one CLI:

  * real data present  -> restore -> inference over the val split ->
    dataset metric (KITTI AP for the KITTI families; see --eval)
  * --synthetic        -> forward + decode on an adapter-generated
    batch; prints detection sanity stats (the data-free eval smoke)

Usage:
  python tools/test.py configs/dfm_r34_kitti_3class.py \
      --checkpoint work_dirs/dfm/ckpts --eval kitti
  python tools/test.py configs/hv_second_kitti_3class.py --synthetic
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None,
                   help='checkpoint dir (latest step restored); random '
                        'init if omitted')
    p.add_argument('--cfg-options', nargs='*', default=None)
    p.add_argument('--eval', default='kitti',
                   help='metric: kitti | waymo | nuscenes | lyft | none')
    p.add_argument('--waymo-gt-bin', default=None,
                   help='GT .bin for --eval waymo (default: '
                        '<data_root>/gt.bin, built from the val infos '
                        'when absent)')
    p.add_argument('--fuse-conv-bn', action='store_true',
                   help='fold BatchNorm into conv kernels before '
                        'inference (utils/fuse_conv_bn.py; no-op for '
                        'GN-normalized models like DfM/LIGA)')
    p.add_argument('--synthetic', action='store_true',
                   help='decode on an adapter-generated batch '
                        '(no dataset needed)')
    p.add_argument('--max-samples', type=int, default=None)
    p.add_argument('--out', default=None, help='pkl of raw results')
    return p.parse_args()


def restore_variables(args, variables):
    import jax
    from dfm_tpu.runtime import CheckpointManager
    if args.checkpoint:
        ckpt = CheckpointManager(args.checkpoint)
        restored = ckpt.restore_model(
            jax.device_get(variables['params']),
            jax.device_get(variables.get('batch_stats', {})))
        print(f'restored step {int(restored["step"])}')
        variables = {'params': restored['params'],
                     'batch_stats': restored['batch_stats']}
    if getattr(args, 'fuse_conv_bn', False):
        from dfm_tpu.utils.fuse_conv_bn import fuse_conv_bn
        variables = fuse_conv_bn(variables)
        print('[fuse] BatchNorm folded into conv kernels')
    return variables


def synthetic_eval(args, handle, adapter):
    """Forward + decode on a synthetic batch; per-family eval smoke."""
    import jax
    batch = adapter.synthetic_batch(handle, 1, 0)
    args_m = adapter.model_args(batch)
    variables = handle.module.init(jax.random.PRNGKey(0), *args_m,
                                   train=False)
    variables = restore_variables(args, variables)
    outputs = jax.jit(
        lambda v: handle.module.apply(v, *args_m, train=False))(variables)
    det = adapter.predict(handle, outputs, batch)
    flat = jax.tree_util.tree_leaves(det)
    finite = all(np.isfinite(np.asarray(x)).all() for x in flat
                 if np.asarray(x).dtype.kind == 'f')
    print(f'[synthetic-eval] {handle.type}: decoded '
          f'{len(flat)} output arrays, finite={finite}')
    for k, v in (det.items() if isinstance(det, dict) else []):
        print(f'  {k}: shape={np.asarray(v).shape}')
    if not finite:
        raise SystemExit(f'non-finite detections for {handle.type}')


def kitti_mono_eval(args, cfg, handle, adapter):
    """Restore -> mono inference -> KITTI AP for the FCOS3D/PGD family.

    Boxes come out of the anchor-free decode in the CAMERA frame
    (fcos3d_get_bboxes), so the anno conversion is
    cam_detections_to_kitti_annos; the 2D bbox for the metric is
    projected with the ORIGINAL-image P2 (the model sees a resized
    image with scaled intrinsics; the 3D boxes are resize-invariant).
    """
    import pickle
    import jax
    import jax.numpy as jnp
    from dfm_tpu.data.kitti_mono import (KittiMonoDataset,
                                         load_mono_image,
                                         mono_info_from_native)
    from dfm_tpu.evaluation import (cam_detections_to_kitti_annos,
                                    kitti_eval)

    d = cfg.data
    img_hw = tuple(d.get('img_hw', (384, 1280)))
    with open(os.path.join(d.data_root, 'kitti_infos_val.pkl'),
              'rb') as f:
        infos = pickle.load(f)
    infos = infos['infos'] if isinstance(infos, dict) else infos
    ds = KittiMonoDataset(
        [mono_info_from_native(i, d.data_root, img_hw) for i in infos],
        max_gt=d.get('max_gt', 32))

    s0 = ds.get_sample(0)
    img0 = jnp.asarray(load_mono_image(s0['img_path'], img_hw)[None])
    variables = handle.module.init(jax.random.PRNGKey(0), img0,
                                   train=False)
    variables = restore_variables(args, variables)

    @jax.jit
    def infer(variables, img, cam2img):
        out = handle.module.apply(variables, img, train=False)
        return adapter.predict(handle, out,
                               dict(img=img, cam2img=cam2img))

    n = min(len(ds), args.max_samples or len(ds))
    gt_annos, dt_annos = [], []
    img_cache = {}
    for i in range(n):
        info = infos[i]
        s = ds.get_sample(i)
        if s['img_path'] not in img_cache:
            img_cache.clear()
            img_cache[s['img_path']] = jnp.asarray(
                load_mono_image(s['img_path'], img_hw)[None])
        det = infer(variables, img_cache[s['img_path']],
                    jnp.asarray(s['cam2img'])[None])
        det0 = jax.tree.map(lambda x: np.asarray(x[0]), det)
        dt_annos.append(cam_detections_to_kitti_annos(
            det0, np.asarray(info['calib']['P2'])[:3],
            info.get('image', {}).get('image_shape', (375, 1242))))
        a = info.get('annos_eval') or info['annos']
        gt_annos.append(dict(a))
        print(f'[{i + 1}/{n}] dets={len(dt_annos[-1]["name"])}',
              flush=True)

    if args.out:
        with open(args.out, 'wb') as f:
            pickle.dump(dt_annos, f)
    res = kitti_eval(gt_annos, dt_annos)
    for k in sorted(res):
        print(f'{k}: {res[k]:.4f}')
    return res


def kitti_dfm_eval(args, cfg, handle):
    """Restore -> infer -> KITTI AP for the DfM family on real data."""
    import jax
    import jax.numpy as jnp
    from dfm_tpu.data.kitti import KittiDataset
    from dfm_tpu.evaluation import detections_to_kitti_annos, kitti_eval
    from dfm_tpu.models import BatchMeta
    from dfm_tpu.models.detectors.dfm import dfm_predict
    from tools.train import build_batch

    mcfg = handle.cfg
    model = handle.module

    d = cfg.data
    ds = KittiDataset(
        d.data_root, os.path.join(d.data_root, 'kitti_infos_val.pkl'),
        train=False,
        pipeline_kwargs=dict(crop_size=tuple(d.crop_size),
                             max_gt=d.max_gt))

    rng = np.random.default_rng(0)
    s0 = ds.get_sample(0, rng)
    batch0 = build_batch([s0], BatchMeta)
    variables = model.init(jax.random.PRNGKey(0), batch0['img'],
                           batch0['meta'], train=False)
    variables = restore_variables(args, variables)

    @jax.jit
    def infer(variables, img, meta):
        out = model.apply(variables, img, meta, train=False)
        return dfm_predict(out, mcfg)

    n = min(len(ds), args.max_samples or len(ds))
    gt_annos, dt_annos = [], []
    for i in range(n):
        info = ds.infos[i]
        s = ds.get_sample(i, rng)
        batch = build_batch([s], BatchMeta)
        det = infer(variables, batch['img'], batch['meta'])
        det0 = jax.tree.map(lambda x: np.asarray(x[0]), det)
        dt_annos.append(detections_to_kitti_annos(
            det0, np.asarray(info['calib']['P2'])[:3],
            info.get('image', {}).get('image_shape', (375, 1242))))
        if 'annos_eval' in info:
            # full-protocol eval annos: original names (Van, DontCare,
            # ...) so clean_data applies the official ignore rules
            gt_annos.append(dict(info['annos_eval']))
        else:  # legacy infos without the eval view
            a = info['annos']
            pl = a['gt_boxes_pl']
            gt_annos.append(dict(
                name=np.asarray(a['names']),
                truncated=a['truncated'], occluded=a['occluded'],
                bbox=a['bbox2d'],
                dimensions=np.stack([pl[:, 3], pl[:, 5], pl[:, 4]], 1),
                location=np.stack([-pl[:, 1], -pl[:, 2], pl[:, 0]], 1),
                rotation_y=-pl[:, 6] - np.pi / 2))
        print(f'[{i + 1}/{n}] dets={len(dt_annos[-1]["name"])}',
              flush=True)

    if args.out:
        import pickle
        with open(args.out, 'wb') as f:
            pickle.dump(dt_annos, f)
    if args.eval == 'kitti':
        res = kitti_eval(gt_annos, dt_annos)
        for k in sorted(res):
            if 'moderate' in k or '3d' in k:
                print(f'{k}: {res[k]:.4f}')


def indoor_real_eval(args, cfg, handle, adapter):
    """Restore -> infer -> indoor AP_0.25/0.5 for the VoteNet family
    on SUN RGB-D / ScanNet infos (reference tools/test.py ->
    dataset.evaluate -> indoor_eval)."""
    import jax
    import jax.numpy as jnp
    from dfm_tpu.data.indoor import ScanNetDataset, SUNRGBDDataset
    d = cfg.data
    cls = {'SUNRGBDDataset': SUNRGBDDataset,
           'ScanNetDataset': ScanNetDataset}[d.type]
    stem = 'sunrgbd' if 'SUNRGBD' in d.type else 'scannet'
    ds = cls(d.data_root,
             os.path.join(d.data_root, f'{stem}_infos_val.pkl'),
             train=False, num_points=d.get('num_points', None),
             max_gt=d.get('max_gt', 64))
    s0 = ds.get_sample(0)
    pts0 = jnp.asarray(s0['points'])[None]
    variables = handle.module.init(jax.random.PRNGKey(0), pts0,
                                   train=False)
    variables = restore_variables(args, variables)

    @jax.jit
    def infer(variables, pts):
        out = handle.module.apply(variables, pts, train=False)
        return out

    n = min(len(ds), args.max_samples or len(ds))
    results = []
    for i in range(n):
        s = ds.get_sample(i)
        out = infer(variables, jnp.asarray(s['points'])[None])
        det = adapter.predict(handle, out, dict(points=None))
        det0 = jax.tree.map(lambda x: np.asarray(x[0]), det)
        results.append(dict(boxes3d=det0['boxes3d'],
                            scores=det0['scores'],
                            labels=det0['labels'],
                            mask=det0.get('mask',
                                          det0['labels'] >= 0)))
        print(f'[{i + 1}/{n}] dets={int(results[-1]["mask"].sum())}',
              flush=True)
    res = ds.evaluate(results)
    for k in sorted(res):
        if k.startswith('mAP') or k.startswith('mAR'):
            print(f'{k}: {res[k]:.4f}')
    if args.out:
        import pickle
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)


def waymo_real_eval(args, cfg, handle, adapter):
    """Restore -> multi-view inference -> Objects .bin -> LET metrics
    (reference tools/test.py:130 -> WaymoDataset.format_results ->
    metric shell-out, datasets/waymo_dataset.py:405-720; hermetic
    LET-mAP fallback when the official binary is absent)."""
    import jax
    import jax.numpy as jnp
    from dfm_tpu.data.waymo import WaymoDataset
    d = cfg.data
    ds = WaymoDataset(
        d.data_root, os.path.join(d.data_root, 'waymo_infos_val.pkl'),
        num_frames=d.get('num_frames', 1),
        target_hw=tuple(d.get('target_hw', (640, 960))),
        num_views=d.get('num_views', 5), max_gt=d.get('max_gt', 64),
        load_mode=d.get('load_mode', 'lidar_frame'),
        cam_sync=d.get('cam_sync', False))

    def to_batch(s):
        return {('img' if k == 'imgs' else k):
                jnp.asarray(np.asarray(v)[None]) for k, v in s.items()}

    batch0 = to_batch(ds.get_sample(0))
    variables = handle.module.init(
        jax.random.PRNGKey(0), *adapter.model_args(batch0), train=False)
    variables = restore_variables(args, variables)

    @jax.jit
    def infer(variables, *margs):
        return handle.module.apply(variables, *margs, train=False)

    n = min(len(ds), args.max_samples or len(ds))
    results = []
    for i in range(n):
        batch = to_batch(ds.get_sample(i))
        out = infer(variables, *adapter.model_args(batch))
        det = adapter.predict(handle, out, batch)
        det0 = jax.tree.map(lambda x: np.asarray(x[0]), det)
        m = np.asarray(det0.get('mask', det0['scores'] > 0)).astype(bool)
        results.append(dict(boxes_3d=det0['boxes3d'][m],
                            labels_3d=det0['labels'][m],
                            scores_3d=det0['scores'][m]))
        print(f'[{i + 1}/{n}] dets={int(m.sum())}', flush=True)

    ds.infos = ds.infos[:len(results)]
    gt_bin = args.waymo_gt_bin or os.path.join(d.data_root, 'gt.bin')
    if not os.path.exists(gt_bin):
        from dfm_tpu.evaluation.waymo_eval import gt_annos_to_bin

        from tools.create_waymo_gt_bin import gt_objects_from_infos
        gt_bin = os.path.join('/tmp', 'waymo_gt_cli.bin')
        n_gt = gt_annos_to_bin(gt_objects_from_infos(
            ds.infos, cam_sync=d.get('cam_sync', False)), gt_bin)
        print(f'[gt] built {gt_bin} ({n_gt} objects) from val infos')
    res = ds.evaluate(results, gt_bin)
    for k in sorted(res):
        v = res[k]
        if isinstance(v, float):
            print(f'{k}: {v:.4f}')
    if args.out:
        import pickle
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)


def nuscenes_real_eval(args, cfg, handle, adapter):
    """Restore -> mono inference -> NDS metrics (reference
    NuScenesMonoDataset.evaluate -> nuscenes devkit; hermetic metric
    in data/nuscenes.py)."""
    import jax
    import jax.numpy as jnp
    from dfm_tpu.data.nuscenes import NuScenesMonoDataset
    d = cfg.data
    ds = NuScenesMonoDataset(
        d.data_root, d.get('ann_file', 'nuscenes_infos_mono_val.pkl'),
        max_gt=d.get('max_gt', 48))
    s0 = ds.get_sample(0)
    img0 = jnp.asarray(s0['img'][None].astype(np.float32))
    variables = handle.module.init(jax.random.PRNGKey(0), img0,
                                   train=False)
    variables = restore_variables(args, variables)

    @jax.jit
    def infer(variables, img):
        return handle.module.apply(variables, img, train=False)

    n = min(len(ds), args.max_samples or len(ds))
    results = []
    for i in range(n):
        s = ds.get_sample(i)
        img = jnp.asarray(s['img'][None].astype(np.float32))
        out = infer(variables, img)
        det = adapter.predict(handle, out, dict(
            img=img, cam2img=jnp.asarray(s['cam2img'])[None]))
        det0 = jax.tree.map(lambda x: np.asarray(x[0]), det)
        m = np.asarray(det0.get('mask', det0['scores'] > 0)).astype(bool)
        boxes = np.asarray(det0.get('boxes3d', det0.get('boxes')))[m]
        if boxes.shape[-1] == 7:
            # models that predict velocities return them in a separate
            # key; use them for the NDS velocity TP error, else zeros
            if det0.get('velocity') is not None:
                velo = np.asarray(det0['velocity'])[m][:, :2]
            else:
                velo = np.zeros((len(boxes), 2), boxes.dtype)
            boxes = np.concatenate([boxes, velo.astype(boxes.dtype)], -1)
        results.append(dict(boxes=boxes, scores=det0['scores'][m],
                            labels=det0['labels'][m],
                            attrs=det0['attrs'][m]
                            if det0.get('attrs') is not None else None))
        print(f'[{i + 1}/{n}] dets={int(m.sum())}', flush=True)
    ds.infos = ds.infos[:len(results)]
    res = ds.evaluate(results)
    for k in sorted(res):
        v = res[k]
        if isinstance(v, float):
            print(f'{k}: {v:.4f}')
    if args.out:
        import pickle
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)


def lyft_real_eval(args, cfg, handle, adapter):
    """Restore -> LiDAR inference -> Kaggle Lyft mAP
    (reference LyftDataset.evaluate -> lyft devkit mAP; hermetic
    metric in data/lyft.py)."""
    import jax
    import jax.numpy as jnp
    from dfm_tpu.data.lyft import LyftDataset
    d = cfg.data
    ds = LyftDataset(
        d.data_root,
        os.path.join(d.data_root, d.get('ann_file',
                                        'lyft_infos_val.pkl')),
        train=False, max_points=d.get('max_points', 32768),
        max_gt=d.get('max_gt', 64),
        sweeps_num=d.get('sweeps_num', 0))
    s0 = ds.get_sample(0)
    batch0 = {k: jnp.asarray(np.asarray(v)[None])
              for k, v in s0.items()}
    variables = handle.module.init(
        jax.random.PRNGKey(0), *adapter.model_args(batch0), train=False)
    variables = restore_variables(args, variables)

    @jax.jit
    def infer(variables, *margs):
        return handle.module.apply(variables, *margs, train=False)

    n = min(len(ds), args.max_samples or len(ds))
    results = []
    for i in range(n):
        batch = {k: jnp.asarray(np.asarray(v)[None])
                 for k, v in ds.get_sample(i).items()}
        out = infer(variables, *adapter.model_args(batch))
        det = adapter.predict(handle, out, batch)
        det0 = jax.tree.map(lambda x: np.asarray(x[0]), det)
        m = np.asarray(det0.get('mask', det0['scores'] > 0)).astype(bool)
        results.append(dict(boxes3d=det0['boxes3d'][m],
                            scores=det0['scores'][m],
                            labels=det0['labels'][m]))
        print(f'[{i + 1}/{n}] dets={int(m.sum())}', flush=True)
    ds.infos = ds.infos[:len(results)]
    res = ds.evaluate(results)
    for k in sorted(res):
        v = res[k]
        if isinstance(v, float):
            print(f'{k}: {v:.4f}')
    if args.out:
        import pickle
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)


def seg_real_eval(args, cfg, handle):
    """Restore -> sliding-patch inference per scene -> mIoU
    (reference tools/test.py -> Custom3DSegDataset.evaluate ->
    seg_eval; slide semantics in models/segmentors/encoder_decoder.py)."""
    import jax
    import jax.numpy as jnp
    from dfm_tpu.data.seg3d import build_seg_dataset
    from dfm_tpu.models.segmentors import slide_inference
    ds = build_seg_dataset(cfg.data, train=False)
    scfg = handle.cfg
    nfeat = 3 + (ds.load_scene(0)[0].shape[1] - 3) \
        + (3 if scfg.use_normalized_coord else 0)
    probe = jnp.zeros((scfg.test_batch_size, scfg.num_points, nfeat),
                      jnp.float32)
    variables = handle.module.init(jax.random.PRNGKey(0), probe,
                                   train=False)
    variables = restore_variables(args, variables)
    apply_fn = jax.jit(
        lambda pts: handle.module.apply(variables, pts, train=False))
    n = min(len(ds.infos), args.max_samples or len(ds.infos))
    results = []
    for i in range(n):
        pts, _ = ds.load_scene(i)
        pred = slide_inference(apply_fn, pts, scfg)
        results.append(pred)
        print(f'[{i + 1}/{n}] {pts.shape[0]} pts', flush=True)
    ds.infos = ds.infos[:n]          # cap eval to the scenes inferred
    res = ds.evaluate(results)
    for k in sorted(res):
        v = res[k]
        if isinstance(v, float):
            print(f'{k}: {v:.4f}')
    if args.out:
        import pickle
        with open(args.out, 'wb') as f:
            pickle.dump(results, f)


def main():
    args = parse_args()
    from dfm_tpu.utils.env import setup_platform
    setup_platform()
    from dfm_tpu.models import build_detector
    from dfm_tpu.runtime.adapters import get_adapter
    from dfm_tpu.runtime.config import load_config, merge_options

    cfg = merge_options(load_config(args.config), args.cfg_options)
    handle = build_detector(cfg.model.to_dict())
    adapter = get_adapter(handle.type)
    print(f'[model] {handle.type} via registry')

    data_root = cfg.data.get('data_root', '') if 'data' in cfg else ''
    dtype_name = cfg.data.get('type', '') if 'data' in cfg else ''
    if dtype_name.endswith('SegDataset'):
        from dfm_tpu.data.seg3d import seg_ann_files
        ann = seg_ann_files(cfg.data, train=False)
        if not args.synthetic and all(os.path.exists(a) for a in ann):
            seg_real_eval(args, cfg, handle)
            return
        synthetic_eval(args, handle, adapter)
        return
    info = {'SUNRGBDDataset': 'sunrgbd_infos_val.pkl',
            'ScanNetDataset': 'scannet_infos_val.pkl',
            'WaymoDataset': 'waymo_infos_val.pkl',
            'NuScenesMonoDataset': cfg.data.get(
                'ann_file', 'nuscenes_infos_mono_val.pkl')
            if 'data' in cfg else '',
            'LyftDataset': cfg.data.get('ann_file', 'lyft_infos_val.pkl')
            if 'data' in cfg else ''}.get(
                dtype_name, 'kitti_infos_val.pkl')
    have_data = bool(data_root) and os.path.exists(
        os.path.join(data_root, info))

    if args.synthetic or not have_data:
        if not args.synthetic:
            print(f'[data] {data_root!r} not found -> synthetic eval '
                  'smoke')
        synthetic_eval(args, handle, adapter)
        return

    if handle.type in ('DfM', 'DfMFull'):
        kitti_dfm_eval(args, cfg, handle)
        return
    if dtype_name == 'KittiMono' and handle.type in (
            'FCOSMono3D', 'PGD', 'SMOKEMono3D'):
        kitti_mono_eval(args, cfg, handle, adapter)
        return
    if dtype_name in ('SUNRGBDDataset', 'ScanNetDataset'):
        indoor_real_eval(args, cfg, handle, adapter)
        return
    if dtype_name == 'WaymoDataset' or args.eval == 'waymo':
        waymo_real_eval(args, cfg, handle, adapter)
        return
    if dtype_name == 'NuScenesMonoDataset' or args.eval == 'nuscenes':
        nuscenes_real_eval(args, cfg, handle, adapter)
        return
    if dtype_name == 'LyftDataset' or args.eval == 'lyft':
        lyft_real_eval(args, cfg, handle, adapter)
        return
    print(f'[data] no real-data eval wired for {handle.type}; running '
          'synthetic eval smoke')
    synthetic_eval(args, handle, adapter)


if __name__ == '__main__':
    main()
