#!/usr/bin/env python
"""Point-cloud 3D detection demo (reference demo/pcd_demo.py
equivalent): one LiDAR scan + a detector config -> 3D boxes printed,
dumped as MeshLab .obj wireframes, and as a self-contained WebGL HTML
viewer.

Usage:
  python demo/pcd_demo.py SCAN.bin configs/hv_second_kitti_3class.py \
      [--checkpoint work_dirs/x/ckpts] [--out-dir demo_out] \
      [--score-thr 0.3] [--load-dim 4]
Runs with random weights when no checkpoint is given (smoke/demo mode,
like the repo's other demos).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('pcd', help='point cloud .bin (float32 rows)')
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None,
                   help='orbax checkpoint dir (latest step restored)')
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--out-dir', default='demo_out')
    p.add_argument('--load-dim', type=int, default=4,
                   help='columns per point in the .bin')
    p.add_argument('--max-points', type=int, default=32768)
    p.add_argument('--cfg-options', nargs='*', default=None,
                   help='config deep-merge overrides (key=val)')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from dfm_tpu.models import build_detector
    from dfm_tpu.runtime.adapters import get_adapter
    from dfm_tpu.runtime.config import load_config
    from dfm_tpu.visualization.html_vis import export_scene_html
    from dfm_tpu.visualization.show_result import show_result_meshlab

    from dfm_tpu.runtime.config import merge_options
    cfg = merge_options(load_config(args.config), args.cfg_options)
    handle = build_detector(cfg.model.to_dict())
    adapter = get_adapter(cfg.model.type)

    raw = np.fromfile(args.pcd, np.float32).reshape(-1, args.load_dim)
    pts = raw[:, :3]
    n = len(pts)
    sel = np.random.RandomState(0).choice(
        n, args.max_points, replace=n < args.max_points)
    batch = dict(points=jnp.asarray(pts[sel])[None],
                 point_mask=jnp.ones((1, args.max_points), bool))

    margs = adapter.model_args(batch)
    variables = handle.module.init(jax.random.PRNGKey(0), *margs,
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

    out = handle.module.apply(variables, *margs, train=False)
    det = adapter.predict(handle, out, batch)
    det0 = jax.tree.map(lambda x: np.asarray(x[0]), det)
    keep = np.asarray(det0['scores']) >= args.score_thr
    if 'mask' in det0:
        keep &= np.asarray(det0['mask']).astype(bool)
    boxes = np.asarray(det0['boxes3d'])[keep]
    scores = np.asarray(det0['scores'])[keep]
    labels = np.asarray(det0['labels'])[keep]
    print(f'{len(boxes)} detections >= {args.score_thr}')
    for b, s, c in zip(boxes, scores, labels):
        print(f'  cls {int(c)}  score {s:.3f}  '
              f'xyz ({b[0]:.2f}, {b[1]:.2f}, {b[2]:.2f})  '
              f'lwh ({b[3]:.2f}, {b[4]:.2f}, {b[5]:.2f})  '
              f'yaw {b[6]:.2f}')
    name = os.path.splitext(os.path.basename(args.pcd))[0]
    paths = show_result_meshlab(pts, None, boxes, args.out_dir,
                                filename=name)
    html = os.path.join(args.out_dir, f'{name}.html')
    export_scene_html(pts, html, pred_boxes=boxes)
    paths['html'] = html
    for k, v in paths.items():
        print(f'wrote {k}: {v}')


if __name__ == '__main__':
    main()
