"""End-to-end train->AP regression: the mini-KITTI overfit loop must
produce a saturating Pedestrian AP through the REAL CLIs.

This is the test that would have caught the round-4 failure where the
detection losses were silently normalized by pos+neg (~6000) instead of
num_pos (reference mmdet anchor3d_head.py:380 sampling=False rule) and
300 steps of "training" only learned dense depth (AP 0.0 everywhere).

Slow tier: ~10 min of training on the TPU (or considerably longer on
CPU). The GT-echo half (eval pipeline only) lives in
tests/test_kitti_eval_oracle.py and runs in the fast tier.

Reference semantics being matched: train_detector + single_gpu_test +
kitti_eval (/root/reference/mmdet3d/core/evaluation/kitti_utils/eval.py:662)
on /root/reference/tests/data/kitti.
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_ROOT = os.path.join(REPO, 'data', 'mini_kitti')


def _run(cmd, timeout):
    return subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=timeout,
                          env={**os.environ, 'PYTHONUNBUFFERED': '1'})


@pytest.mark.slow
@pytest.mark.parametrize('config', [
    'configs/dfm_r18_mini_overfit.py',       # anchor head, pseudo-lidar
    'configs/fcos3d_r18_mini_overfit.py',    # anchor-free, camera frame
])
def test_mini_overfit_train_then_ap(tmp_path, config):
    if not os.path.isdir(os.path.join(DATA_ROOT, 'training')):
        r = _run([sys.executable, 'tools/make_mini_kitti.py', DATA_ROOT],
                 timeout=120)
        if r.returncode != 0:
            pytest.skip(f'mini-KITTI fixture unavailable: {r.stderr[-300:]}')

    work = str(tmp_path / 'overfit')
    r = _run([sys.executable, 'tools/train.py', config,
              '--work-dir', work, '--max-steps', '300'], timeout=3600)
    assert r.returncode == 0, r.stderr[-2000:]

    r = _run([sys.executable, 'tools/test.py', config,
              '--checkpoint', os.path.join(work, 'ckpts'),
              '--eval', 'kitti'], timeout=3600)
    assert r.returncode == 0, r.stderr[-2000:]
    ap = {m.group(1): float(m.group(2))
          for m in re.finditer(r'(\w+): (\d+\.\d+)', r.stdout)}
    key = 'Pedestrian_3d_easy_strict'
    assert key in ap, sorted(ap)
    assert ap[key] > 80.0, {k: v for k, v in ap.items()
                            if k.startswith('Pedestrian_3d')}
