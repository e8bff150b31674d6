#!/usr/bin/env python
"""Inference throughput benchmark for any config (equivalent of the
reference's tools/analysis_tools/benchmark.py fps loop).

Usage:
  python tools/benchmark.py configs/dfm_r34_kitti_3class.py [--iters 24]

Uses the chained-iteration timing methodology (see bench.py): N model
invocations serialized inside one jitted program, two chain lengths
differenced to cancel launch/round-trip costs (the tunnel in this image
fakes block_until_ready).
"""

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--iters', type=int, default=24)
    p.add_argument('--short', type=int, default=4)
    p.add_argument('--cfg-options', nargs='*', default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from dfm_tpu.runtime.config import load_config, merge_options

    cfg = merge_options(load_config(args.config), args.cfg_options)
    m = cfg.model.to_dict()
    mtype = m.pop('type')
    rng = np.random.RandomState(0)

    if mtype == 'DfM':
        from dfm_tpu.models import BatchMeta, DfM, DfMConfig, dfm_predict
        fields = {f.name for f in dataclasses.fields(DfMConfig)}
        mcfg = DfMConfig(**{k: (tuple(v) if isinstance(v, list) else v)
                            for k, v in m.items() if k in fields})
        model = DfM(cfg=mcfg, dtype=jnp.bfloat16)
        h, w = cfg.data.crop_size
        img = jnp.asarray(rng.randn(1, 2, h, w, 3).astype(np.float32))
        cam = np.eye(4, dtype=np.float32)
        cam[0, 0] = cam[1, 1] = 721.5
        cam[0, 2], cam[1, 2] = w / 2, h / 2
        meta = BatchMeta.identity(1, jnp.asarray(cam)[None])
        meta = dataclasses.replace(meta, org_w=jnp.full((1,), 1242.0))
        variables = jax.jit(lambda r: model.init(
            r, img, meta, train=False))(jax.random.PRNGKey(0))

        def step(c):
            out = model.apply(variables, img + c * 1e-30, meta,
                              train=False)
            det = dfm_predict(out, mcfg)
            return jnp.sum(det['scores']).astype(img.dtype)
    elif mtype in ('FCOSMono3D', 'PGD'):
        from dfm_tpu.models import (FCOS3DConfig, FCOSMono3D,
                                    fcos_mono3d_predict)
        fields = {f.name for f in dataclasses.fields(FCOS3DConfig)}
        depth = m.pop('backbone_depth', 101)
        mcfg = FCOS3DConfig(**{k: (tuple(v) if isinstance(v, list) else v)
                               for k, v in m.items() if k in fields})
        model = FCOSMono3D(cfg=mcfg, backbone_depth=depth,
                           dtype=jnp.bfloat16)
        h, w = cfg.data.img_hw
        img = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
        cam = np.eye(4, dtype=np.float32)
        cam[0, 0] = cam[1, 1] = 721.5
        cam[0, 2], cam[1, 2] = w / 2, h / 2
        cam = jnp.asarray(cam)[None]
        variables = jax.jit(lambda r: model.init(
            r, img, train=False))(jax.random.PRNGKey(0))

        def step(c):
            outs = model.apply(variables, img + c * 1e-30, train=False)
            det = fcos_mono3d_predict(outs, (h, w), cam, mcfg)
            return jnp.sum(det['scores']).astype(img.dtype)
    else:
        raise SystemExit(f'benchmark: unsupported model type {mtype}')

    def chained(n):
        return jax.jit(lambda: jnp.sum(jax.lax.fori_loop(
            0, n, lambda i, c: step(c), jnp.zeros((), img.dtype))))

    run_l, run_s = chained(args.iters), chained(args.short)
    float(run_l())
    float(run_s())

    def t(fn):
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t(run_l) - t(run_s)) / (args.iters - args.short)
    print(f'{mtype} [{os.path.basename(args.config)}]: '
          f'{per * 1000:.1f} ms/img ({1 / per:.2f} img/s) on '
          f'{jax.devices()[0].platform}')


if __name__ == '__main__':
    main()
