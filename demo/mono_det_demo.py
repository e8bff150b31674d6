#!/usr/bin/env python
"""Monocular 3D detection demo (reference demo/mono_det_demo.py
equivalent): one image + intrinsics -> 3D boxes printed / drawn.

Usage:
  python demo/mono_det_demo.py IMAGE --fx 721.5 --cx 609.6 --cy 172.8 \
      [--out vis.png]
Runs with random weights when no checkpoint is given (smoke/demo mode).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('image')
    p.add_argument('--fx', type=float, default=721.5)
    p.add_argument('--fy', type=float, default=None)
    p.add_argument('--cx', type=float, default=None)
    p.add_argument('--cy', type=float, default=None)
    p.add_argument('--score-thr', type=float, default=0.1)
    p.add_argument('--out', default=None)
    args = p.parse_args()

    import cv2
    from dfm_tpu.apis import inference_mono_3d, init_mono_model
    from dfm_tpu.models import FCOS3DConfig

    img = cv2.imread(args.image)
    h, w = img.shape[:2]
    cam = np.array([[args.fx, 0, args.cx or w / 2, 0],
                    [0, args.fy or args.fx, args.cy or h / 2, 0],
                    [0, 0, 1, 0]], np.float32)

    import jax
    import jax.numpy as jnp
    handle = init_mono_model(FCOS3DConfig(score_thr=args.score_thr))
    from dfm_tpu.data.pipeline import normalize_image
    norm = normalize_image(img.astype(np.float32))[None]
    variables = handle['model'].init(jax.random.PRNGKey(0),
                                     jnp.asarray(norm), train=False)
    det = inference_mono_3d(handle, variables, img, cam)
    mask = np.asarray(det['mask'][0])
    boxes = np.asarray(det['boxes3d'][0])[mask]
    scores = np.asarray(det['scores'][0])[mask]
    labels = np.asarray(det['labels'][0])[mask]
    print(f'{mask.sum()} detections')
    for b, s, l in zip(boxes, scores, labels):
        print(f'  cls={int(l)} score={s:.3f} xyz=({b[0]:.1f},{b[1]:.1f},'
              f'{b[2]:.1f}) lhw=({b[3]:.1f},{b[4]:.1f},{b[5]:.1f}) '
              f'ry={b[6]:.2f}')
    if args.out:
        from dfm_tpu.evaluation.results import _corners_cam
        loc = boxes[:, :3]
        dims = boxes[:, 3:6][:, [0, 2, 1]]
        corners = _corners_cam(loc, dims, boxes[:, 6])
        homo = np.concatenate(
            [corners, np.ones_like(corners[..., :1])], -1)
        uvw = homo @ np.vstack([cam, [0, 0, 0, 1]]).T
        uv = (uvw[..., :2] / np.maximum(uvw[..., 2:3], 1e-3)).astype(int)
        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
                 (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]
        for box_uv in uv:
            for a, b in edges:
                cv2.line(img, tuple(box_uv[a]), tuple(box_uv[b]),
                         (0, 255, 0), 2)
        cv2.imwrite(args.out, img)
        print('wrote', args.out)


if __name__ == '__main__':
    main()
