#!/usr/bin/env python
"""Evaluate a dfm_tpu model (equivalent of the reference's tools/test.py).

Usage:
  python tools/test.py configs/dfm_r34_kitti_3class.py \
      --checkpoint work_dirs/dfm/ckpts --eval kitti
"""

import argparse
import dataclasses
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
    p.add_argument('--eval', default='kitti')
    p.add_argument('--max-samples', type=int, default=None)
    p.add_argument('--out', default=None, help='pkl of raw results')
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from dfm_tpu.data.kitti import KittiDataset
    from dfm_tpu.evaluation import detections_to_kitti_annos, kitti_eval
    from dfm_tpu.models import (BatchMeta, DfM, DfMConfig, dfm_predict)
    from dfm_tpu.runtime import CheckpointManager
    from dfm_tpu.runtime.config import load_config, merge_options
    from tools.train import build_batch

    cfg = merge_options(load_config(args.config), args.cfg_options)
    m = cfg.model.to_dict()
    m.pop('type', None)
    mcfg = DfMConfig(
        **{k: v for k, v in m.items()
           if k in {f.name for f in dataclasses.fields(DfMConfig)}})
    model = DfM(cfg=mcfg, dtype=jnp.bfloat16)

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
    if args.checkpoint:
        ckpt = CheckpointManager(args.checkpoint)
        restored = ckpt.restore_model(
            jax.device_get(variables['params']),
            jax.device_get(variables.get('batch_stats', {})))
        variables = {'params': restored['params'],
                     'batch_stats': restored['batch_stats']}
        print(f'restored step {int(restored["step"])}')

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


if __name__ == '__main__':
    main()
