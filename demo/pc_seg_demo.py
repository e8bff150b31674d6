#!/usr/bin/env python
"""Point-cloud semantic segmentation demo (reference demo/pc_seg_demo.py
equivalent): one scan + a segmentor config -> per-point labels dumped
as a colored WebGL HTML viewer + a .npy label file.

Usage:
  python demo/pc_seg_demo.py SCAN.bin configs/pointnet2_ssg_s3dis_seg.py \
      [--checkpoint work_dirs/x/ckpts] [--out-dir demo_out] \
      [--load-dim 6]
Runs with random weights when no checkpoint is given (smoke/demo mode).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('pcd', help='point cloud .bin (float32 rows, '
                               'xyz + extra features)')
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--out-dir', default='demo_out')
    p.add_argument('--load-dim', type=int, default=6,
                   help='columns per point in the .bin (xyz + feats)')
    p.add_argument('--cfg-options', nargs='*', default=None,
                   help='config deep-merge overrides (key=val)')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from dfm_tpu.models import build_detector
    from dfm_tpu.models.segmentors import slide_inference
    from dfm_tpu.runtime.config import load_config
    from dfm_tpu.visualization.html_vis import export_scene_html

    from dfm_tpu.runtime.config import merge_options
    cfg = merge_options(load_config(args.config), args.cfg_options)
    handle = build_detector(cfg.model.to_dict())
    scfg = handle.cfg

    pts = np.fromfile(args.pcd, np.float32).reshape(-1, args.load_dim)
    nfeat = pts.shape[1] + (3 if scfg.use_normalized_coord else 0)
    probe = jnp.zeros((scfg.test_batch_size, scfg.num_points, nfeat),
                      jnp.float32)
    variables = handle.module.init(jax.random.PRNGKey(0), probe,
                                   train=False)
    if args.checkpoint:
        from dfm_tpu.runtime import CheckpointManager
        mgr = CheckpointManager(args.checkpoint)
        restored = mgr.restore_model(
            jax.device_get(variables['params']),
            jax.device_get(variables.get('batch_stats', {})))
        variables = {'params': restored['params'],
                     'batch_stats': restored['batch_stats']}
        print(f'restored step {int(restored["step"])}')
    else:
        print('no checkpoint: random weights (smoke mode)')

    apply_fn = jax.jit(
        lambda p_: handle.module.apply(variables, p_, train=False))
    pred = np.asarray(slide_inference(apply_fn, pts, scfg))
    uniq, counts = np.unique(pred, return_counts=True)
    print(f'{len(pts)} points; class histogram:')
    for u, c in zip(uniq, counts):
        print(f'  class {int(u)}: {int(c)}')

    os.makedirs(args.out_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(args.pcd))[0]
    lbl_path = os.path.join(args.out_dir, f'{name}_labels.npy')
    np.save(lbl_path, pred)
    html = os.path.join(args.out_dir, f'{name}_seg.html')
    # per-class colors (golden-angle hue walk -> stable, distinct)
    hues = (np.arange(int(pred.max()) + 1) * 0.6180339887) % 1.0
    palette = np.stack([np.abs(hues * 6 - 3) - 1,
                        2 - np.abs(hues * 6 - 2),
                        2 - np.abs(hues * 6 - 4)], -1).clip(0, 1)
    export_scene_html(pts[:, :3], html,
                      point_colors=palette[pred.astype(int)])
    print(f'wrote labels: {lbl_path}')
    print(f'wrote viewer: {html}')


if __name__ == '__main__':
    main()
