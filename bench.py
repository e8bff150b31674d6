"""Benchmark: DfM-R34 KITTI inference throughput on one TPU chip.

Runs the flagship DfM model at the reference's production shapes
(320x1280 input, 288 depth bins, 0.2 m voxels -> 20x304x288 grid,
LIGA anchor head + rotated NMS) end-to-end under jit, bf16 compute,
and prints ONE JSON line.

Timing methodology: the TPU is reached through a tunnel whose
`block_until_ready` does not guarantee completion, so naive wall-clock
timing reads out fantasy numbers. Instead, N inference iterations are
chained *inside one jitted program* (each iteration's input carries a
zero-scaled dependency on the previous scores, forcing sequential
execution) and a scalar readback closes the measurement. Two chain
lengths are differenced to cancel the fixed launch + round-trip cost.

The reference publishes no fps (BASELINE.md: Mem/fps columns empty).
LIGA-class plane-sweep stereo detectors run ~1.5 img/s on contemporary
GPUs, so `vs_baseline` is reported against 1.5 img/s (BASELINE.json
north star: >=10x reference fps per chip).
"""

import dataclasses
import functools
import json
import time

import numpy as np

ASSUMED_REFERENCE_FPS = 1.5
N_SHORT, N_LONG = 4, 24


def main():
    import jax
    import jax.numpy as jnp
    from dfm_tpu.models import BatchMeta, DfM, DfMConfig, dfm_predict

    cfg = DfMConfig()  # full KITTI config
    model = DfM(cfg=cfg, dtype=jnp.bfloat16)
    b, h, w = 1, 320, 1280

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(b, 2, h, w, 3).astype(np.float32))
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = 721.5
    cam[0, 2] = w / 2
    cam[1, 2] = h / 2
    meta = BatchMeta.identity(b, jnp.tile(jnp.asarray(cam)[None], (b, 1, 1)))
    meta = dataclasses.replace(meta, org_w=jnp.full((b,), 1242.0))

    variables = jax.jit(
        lambda r: model.init(r, img, meta, train=False))(jax.random.PRNGKey(0))

    def chained(n, variables, img, meta):
        def body(i, carry):
            img_i = img + carry * 1e-30   # serialize iterations
            out = model.apply(variables, img_i, meta, train=False)
            det = dfm_predict(out, cfg)
            return jnp.sum(det['scores']).astype(img.dtype)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), img.dtype))

    run_short = jax.jit(functools.partial(chained, N_SHORT))
    run_long = jax.jit(functools.partial(chained, N_LONG))

    # compile + warm both programs (forced readback)
    float(run_short(variables, img, meta))
    float(run_long(variables, img, meta))

    def timed(fn, reps=3):
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(variables, img, meta))   # scalar readback = barrier
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = timed(run_short)
    t_long = timed(run_long)
    per_iter = (t_long - t_short) / (N_LONG - N_SHORT)
    fps = b / per_iter

    print(json.dumps({
        'metric': 'dfm_r34_kitti_infer_fps_per_chip',
        'value': round(fps, 3),
        'unit': 'img/s',
        'vs_baseline': round(fps / ASSUMED_REFERENCE_FPS, 3),
    }))


if __name__ == '__main__':
    main()
