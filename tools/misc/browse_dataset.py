"""Browse dataset samples: dump images with GT overlays + .obj clouds.

Equivalent of the reference's `tools/misc/browse_dataset.py` (iterate a
dataset through its pipeline and save visualizations).

Usage: python tools/misc/browse_dataset.py CONFIG --out-dir DIR \
           [--num 10]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--out-dir', default='work_dirs/browse')
    p.add_argument('--num', type=int, default=10)
    args = p.parse_args()

    from dfm_tpu.data.kitti import KittiDataset
    from dfm_tpu.runtime.config import load_config
    from dfm_tpu.visualization import (draw_boxes_on_image,
                                       show_result_meshlab)

    cfg = load_config(args.config)
    ds = KittiDataset(cfg.data.data_root, split='train',
                      crop_size=tuple(cfg.data.get('crop_size',
                                                   (320, 1280))))
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    import cv2
    for i in range(min(args.num, len(ds))):
        s = ds.get_sample(i, rng)
        img = np.asarray(s['img'][0])
        img = ((img - img.min()) / max(img.ptp(), 1e-6) * 255)
        name = f'sample_{i:04d}'
        boxes_cam = np.asarray(s.get('gt_boxes_cam',
                                     np.zeros((0, 7), np.float32)))
        vis = draw_boxes_on_image(img.astype(np.uint8), boxes_cam,
                                  np.asarray(s['meta'].cam2img[0])
                                  if hasattr(s.get('meta', None),
                                             'cam2img')
                                  else np.asarray(s['cam2img']))
        cv2.imwrite(os.path.join(args.out_dir, name + '.png'), vis)
        if 'points' in s:
            show_result_meshlab(np.asarray(s['points']),
                                np.asarray(s.get('gt_boxes')), None,
                                args.out_dir, name)
        print(f'wrote {name}')


if __name__ == '__main__':
    main()
