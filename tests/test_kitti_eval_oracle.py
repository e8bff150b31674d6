"""GT-echo oracle for the KITTI eval half of the overfit loop.

Feeds the mini-KITTI fixture's own ground-truth boxes through the same
path `tools/test.py --eval kitti` uses for model detections
(`detections_to_kitti_annos` -> `kitti_eval`) and asserts a perfect AP.
This isolates decode/frame/projection bugs in the eval pipeline from
training bugs: if this passes, an AP=0 after training is a training
problem, not an eval problem.

Reference semantics: mmdet3d/core/evaluation/kitti_utils/eval.py:662
on /root/reference/tests/data/kitti.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_ROOT = os.path.join(REPO, 'data', 'mini_kitti')


@pytest.fixture(scope='module')
def mini_kitti():
    if not os.path.isdir(os.path.join(DATA_ROOT, 'training')):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, 'tools', 'make_mini_kitti.py'),
             DATA_ROOT], capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f'mini-KITTI fixture unavailable: {r.stderr[-300:]}')
    return DATA_ROOT


def test_gt_echo_ap_is_perfect(mini_kitti):
    from dfm_tpu.data.kitti import KittiDataset
    from dfm_tpu.evaluation import detections_to_kitti_annos, kitti_eval

    ds = KittiDataset(
        mini_kitti, os.path.join(mini_kitti, 'kitti_infos_val.pkl'),
        train=False)

    gt_annos, dt_annos = [], []
    for info in ds.infos:
        a = info['annos']
        pl = np.asarray(a['gt_boxes_pl'], np.float64)
        labels = np.asarray(a['labels'], np.int64)
        det = dict(boxes3d=pl.astype(np.float32),
                   scores=np.full(len(pl), 0.9, np.float32),
                   labels=labels,
                   mask=np.ones(len(pl), bool))
        dt_annos.append(detections_to_kitti_annos(
            det, np.asarray(info['calib']['P2'])[:3],
            info.get('image', {}).get('image_shape', (375, 1242))))
        if 'annos_eval' in info:
            gt_annos.append(dict(info['annos_eval']))
        else:
            gt_annos.append(dict(
                name=np.asarray(a['names']),
                truncated=a['truncated'], occluded=a['occluded'],
                bbox=a['bbox2d'],
                dimensions=np.stack([pl[:, 3], pl[:, 5], pl[:, 4]], 1),
                location=np.stack([-pl[:, 1], -pl[:, 2], pl[:, 0]], 1),
                rotation_y=-pl[:, 6] - np.pi / 2))

    res = kitti_eval(gt_annos, dt_annos)
    ap3d = [v for k, v in res.items()
            if '3d' in k.lower() and 'easy' in k.lower()]
    assert ap3d, f'no 3d easy AP rows in {sorted(res)}'
    # every GT echoed at score 0.9 -> any class with GT must be ~100
    assert max(ap3d) > 99.0, {k: v for k, v in res.items()
                              if '3d' in k.lower()}
