#!/usr/bin/env python
"""Export a detector to a self-contained serving artifact.

TPU-native equivalent of the reference's torchserve packaging
(tools/deployment/mmdet3d2torchserve.py + mmdet3d_handler.py): instead
of a .mar archive + python handler class, the whole inference function
(preprocess-free model forward + decode + NMS) is staged out ONCE with
`jax.export` into serialized StableHLO with the weights baked in as
constants — the artifact needs no model code, no config, and no
framework version match to serve; any process with jax installed can
`deserialize(...).call(points)`.

Artifact layout (out_dir/):
    model.stablehlo   serialized jax.export.Exported (weights baked in)
    meta.json         input specs + detector type + output keys

Usage:
  python tools/deployment/export_model.py CONFIG OUT_DIR \
      [--checkpoint CKPT_DIR]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..', '..'))

import numpy as np


def export_artifact(config_path, out_dir, checkpoint=None,
                    cfg_overrides=None):
    import jax
    from jax import export as jexport
    from dfm_tpu.models import build_detector
    from dfm_tpu.runtime.adapters import get_adapter
    from dfm_tpu.runtime.config import load_config

    cfg = load_config(config_path)
    model_cfg = cfg.model.to_dict()
    if cfg_overrides:
        model_cfg.update(cfg_overrides)
    handle = build_detector(model_cfg)
    adapter = get_adapter(model_cfg['type'])

    batch = adapter.synthetic_batch(handle, 1, 0)
    margs = adapter.model_args(batch)
    variables = handle.module.init(jax.random.PRNGKey(0), *margs,
                                   train=False)
    if checkpoint:
        from dfm_tpu.runtime import CheckpointManager
        mgr = CheckpointManager(checkpoint)
        restored = mgr.restore_model(
            jax.device_get(variables['params']),
            jax.device_get(variables.get('batch_stats', {})))
        variables = {'params': restored['params'],
                     'batch_stats': restored['batch_stats']}
        print(f'restored step {int(restored["step"])}')

    def infer(*args):
        out = handle.module.apply(variables, *args, train=False)
        det = adapter.predict(handle, out, batch)
        return {k: det[k] for k in sorted(det)}

    specs = [jax.ShapeDtypeStruct(np.asarray(a).shape,
                                  np.asarray(a).dtype) for a in margs]
    exported = jexport.export(jax.jit(infer))(*specs)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, 'model.stablehlo'), 'wb') as f:
        f.write(exported.serialize())
    meta = dict(
        detector_type=model_cfg['type'],
        inputs=[dict(shape=list(s.shape), dtype=str(s.dtype))
                for s in specs],
        outputs=sorted(jax.eval_shape(infer, *specs).keys()),
        platforms=list(exported.platforms),
    )
    with open(os.path.join(out_dir, 'meta.json'), 'w') as f:
        json.dump(meta, f, indent=1)
    size = os.path.getsize(os.path.join(out_dir, 'model.stablehlo'))
    print(f'exported {model_cfg["type"]} -> {out_dir} '
          f'({size / 1e6:.2f} MB, inputs {meta["inputs"]})')
    return meta


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('out_dir')
    p.add_argument('--checkpoint', default=None)
    args = p.parse_args()
    export_artifact(args.config, args.out_dir, args.checkpoint)


if __name__ == '__main__':
    main()
