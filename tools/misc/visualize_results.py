"""Visualize saved detection results as meshlab .obj dumps.

Equivalent of the reference's `tools/misc/visualize_results.py`
(results pkl -> show_result files).

Usage: python tools/misc/visualize_results.py RESULTS.pkl \
           --out-dir DIR [--score-thr 0.3]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('results')
    p.add_argument('--out-dir', default='work_dirs/vis')
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()

    from dfm_tpu.visualization import show_result_meshlab

    with open(args.results, 'rb') as f:
        results = pickle.load(f)
    os.makedirs(args.out_dir, exist_ok=True)
    for i, res in enumerate(results):
        boxes = np.asarray(res.get('boxes_3d', np.zeros((0, 7))))
        scores = np.asarray(res.get('scores_3d', np.zeros((0,))))
        keep = scores > args.score_thr
        show_result_meshlab(res.get('points'), res.get('gt_boxes'),
                            boxes[keep], args.out_dir,
                            f'result_{i:04d}')
    print(f'wrote {len(results)} visualizations to {args.out_dir}')


if __name__ == '__main__':
    main()
