#!/usr/bin/env python
"""Build a framework-native mini-KITTI data root from the reference's
checked-in fixture (2 real frames with PNG images, a real velodyne
scan, calib + prebuilt info pkl at tests/data/kitti of the reference
tree — the same files its own dataset tests consume:
tests/test_data/test_datasets/test_kitti_dataset.py:1).

Converts the reference info pkl to the native schema
(dfm_tpu.data.kitti.infos_from_reference_pkl), writes
kitti_infos_{train,val}.pkl (same single frame in both — this root
exists for the overfit train->AP loop) and symlinks `training/`.

Usage: python tools/make_mini_kitti.py [dst] [--ref-root PATH]
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_REF = '/root/reference/tests/data/kitti'


def build(dst, ref_root=DEFAULT_REF):
    from dfm_tpu.data.kitti import infos_from_reference_pkl
    src_pkl = os.path.join(ref_root, 'kitti_infos_train.pkl')
    if not os.path.exists(src_pkl):
        raise SystemExit(f'{src_pkl} not found')
    infos = infos_from_reference_pkl(src_pkl)
    os.makedirs(dst, exist_ok=True)
    # The official KITTI R40 metric samples precision at 41 recall grid
    # points and AP = sum(precision[1:41])/40 (reference
    # kitti_utils/eval.py get_mAP40 + get_thresholds): a val set with a
    # single GT instance can only ever populate precision[0], so AP is
    # 0 BY CONSTRUCTION even for a perfect detector. Replicate the
    # frame 41x in the val infos so each matched GT contributes one
    # recall grid point and a perfect overfit saturates at AP ~= 100.
    for split, reps in (('train', 1), ('val', 41)):
        with open(os.path.join(dst, f'kitti_infos_{split}.pkl'),
                  'wb') as f:
            pickle.dump(infos * reps, f)
    link = os.path.join(dst, 'training')
    if not os.path.exists(link):
        os.symlink(os.path.join(ref_root, 'training'), link)
    print(f'[mini-kitti] {len(infos)} frame(s) -> {dst}')
    return dst


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('dst', nargs='?', default='data/mini_kitti')
    p.add_argument('--ref-root', default=DEFAULT_REF)
    a = p.parse_args()
    build(a.dst, a.ref_root)
