"""High-level inference APIs.

Equivalent of the reference's `mmdet3d/apis/inference.py`
(`init_model`, `inference_mono_3d_detector`) and `apis/test.py`
(`single_gpu_test`): build + restore a model, run single-image /
single-pair inference, and loop a dataset producing KITTI-format
results.
"""

import dataclasses

import numpy as np

__all__ = ['init_dfm_model', 'inference_dfm', 'init_mono_model',
           'inference_mono_3d', 'dataset_inference']


def init_dfm_model(cfg=None, checkpoint_dir=None, dtype=None):
    """Build a DfM model (+ jitted infer fn); optionally restore weights.

    Returns (infer_fn, variables) where
    infer_fn(variables, img, meta) -> padded detections dict.
    """
    import jax
    import jax.numpy as jnp
    from .models import BatchMeta, DfM, DfMConfig, dfm_predict

    cfg = cfg or DfMConfig()
    model = DfM(cfg=cfg, dtype=dtype or jnp.bfloat16)

    @jax.jit
    def infer(variables, img, meta):
        out = model.apply(variables, img, meta, train=False)
        return dfm_predict(out, cfg)

    def init_variables(img, meta, seed=0):
        return jax.jit(lambda r: model.init(r, img, meta,
                                            train=False))(
            jax.random.PRNGKey(seed))

    def restore(variables, ckpt_dir):
        from .runtime import CheckpointManager
        ckpt = CheckpointManager(ckpt_dir)
        restored = ckpt.restore_model(
            jax.device_get(variables['params']),
            jax.device_get(variables.get('batch_stats', {})))
        return {'params': restored['params'],
                'batch_stats': restored['batch_stats']}

    return dict(model=model, cfg=cfg, infer=infer,
                init_variables=init_variables, restore=restore,
                checkpoint_dir=checkpoint_dir)


def inference_dfm(handle, variables, sample):
    """Run DfM on one pipeline sample dict (see data.pipeline
    load_video_sample output). Returns a KITTI anno dict."""
    import jax
    import jax.numpy as jnp
    from .evaluation import detections_to_kitti_annos
    from .models import BatchMeta

    meta = BatchMeta(
        ori_cam2img=jnp.asarray(sample['ori_cam2img'])[None],
        cam2img=jnp.asarray(sample['cam2img'])[None],
        cur2prev=jnp.asarray(sample['cur2prev'])[None],
        org_w=jnp.asarray([sample['org_w']]),
        flip=jnp.asarray([sample['flip']]),
        crop_offset=jnp.asarray(sample['crop_offset'])[None],
        scale_factor=jnp.asarray([sample['scale_factor']]))
    det = handle['infer'](variables, jnp.asarray(sample['img'])[None], meta)
    det0 = jax.tree.map(lambda x: np.asarray(x[0]), det)
    return detections_to_kitti_annos(
        det0, np.asarray(sample['ori_cam2img'])[:3],
        (int(sample['org_w'] * 0.3), int(sample['org_w'])))


def init_mono_model(cfg=None, backbone_depth=101, dtype=None):
    """Build a FCOS3D mono model + jitted infer fn."""
    import jax
    import jax.numpy as jnp
    from .models import FCOS3DConfig, FCOSMono3D, fcos_mono3d_predict

    cfg = cfg or FCOS3DConfig()
    model = FCOSMono3D(cfg=cfg, backbone_depth=backbone_depth,
                       dtype=dtype or jnp.bfloat16)

    def make_infer(img_hw):
        @jax.jit
        def infer(variables, img, cam2img):
            outs = model.apply(variables, img, train=False)
            return fcos_mono3d_predict(outs, img_hw, cam2img, cfg)
        return infer

    return dict(model=model, cfg=cfg, make_infer=make_infer)


def inference_mono_3d(handle, variables, image, cam2img):
    """Single-image mono 3D inference (reference
    `inference_mono_3d_detector`): image (H, W, 3) raw BGR uint8/float,
    cam2img (3, 4)/(4, 4). Returns camera-frame padded detections."""
    import jax.numpy as jnp
    from .data.pipeline import normalize_image

    img = normalize_image(np.asarray(image, np.float32))[None]
    h, w = img.shape[1:3]
    cam = np.eye(4, dtype=np.float32)
    c = np.asarray(cam2img)
    cam[:c.shape[0], :c.shape[1]] = c
    infer = handle['make_infer']((h, w))
    return infer(variables, jnp.asarray(img), jnp.asarray(cam)[None])


def dataset_inference(handle, variables, dataset, max_samples=None):
    """single_gpu_test equivalent: loop a dataset, return KITTI annos."""
    rng = np.random.default_rng(0)
    n = min(len(dataset), max_samples or len(dataset))
    out = []
    for i in range(n):
        sample = dataset.get_sample(i, rng)
        out.append(inference_dfm(handle, variables, sample))
    return out


def multihost_dataset_inference(handle, variables, dataset,
                                max_samples=None):
    """multi_gpu_test equivalent: each process infers its strided
    shard of the dataset, then results are gathered to every host
    (reference mmdet3d apis `multi_gpu_test` + `collect_results`).

    The gather rides `jax.experimental.multihost_utils`
    `process_allgather` on the per-sample result pytrees, so it works
    on any jax.distributed cluster; with one process it degrades to
    `dataset_inference` exactly.

    Returns the full, dataset-ordered list of results on EVERY host.
    """
    import jax
    nproc = jax.process_count()
    if nproc == 1:
        return dataset_inference(handle, variables, dataset, max_samples)
    from jax.experimental import multihost_utils
    rng = np.random.default_rng(0)
    n = min(len(dataset), max_samples or len(dataset))
    rank = jax.process_index()
    mine = {}
    for i in range(rank, n, nproc):
        sample = dataset.get_sample(i, rng)
        mine[i] = inference_dfm(handle, variables, sample)
    shards = allgather_pickled(mine)
    out = [None] * n
    for shard in shards:
        for i, r in shard.items():
            out[i] = r
    return out


def allgather_pickled(obj):
    """Gather one arbitrary python object per process to ALL processes.

    Detection counts vary per sample, so the eval gather moves a
    length-padded pickle buffer (the reference's collect_results_cpu
    serializes to a shared tmpdir; here it rides the collective).

    Returns list of `process_count` objects, ordered by process index.
    """
    import pickle

    import jax
    from jax.experimental import multihost_utils
    blob = np.frombuffer(pickle.dumps(obj), np.uint8)
    length = np.asarray([len(blob)], np.int64)
    max_len = int(multihost_utils.process_allgather(length).max())
    padded = np.zeros((max_len,), np.uint8)
    padded[:len(blob)] = blob
    bufs = multihost_utils.process_allgather(padded)      # (P, max_len)
    lens = multihost_utils.process_allgather(length)[:, 0]
    return [pickle.loads(bytes(np.asarray(bufs[p][:int(lens[p])])))
            for p in range(jax.process_count())]


def init_dfm_stream(cfg=None, dtype=None):
    """Streaming DfM video inference with prev-frame feature reuse.

    A video detector recomputes its reference-frame 2D trunk every
    step in the reference implementation; in a stream the previous
    frame's stereo features were already computed one step earlier, so
    serving reuses them (`DfM.__call__ prev_stereo_cache`) and each
    step pays ONE backbone+neck pass instead of two. Exact whenever
    consecutive frames share scale/flip (eval pipelines guarantee it);
    the first frame of a sequence runs the full two-frame path.

    Returns dict(infer_first, infer_stream, ...):
        infer_first(variables, img2, meta) -> (dets, cache)
        infer_stream(variables, img1, meta, cache) -> (dets, cache)
    """
    import jax
    import jax.numpy as jnp
    from .models import DfM, DfMConfig, dfm_predict

    cfg = cfg or DfMConfig()
    model = DfM(cfg=cfg, dtype=dtype or jnp.bfloat16)

    @jax.jit
    def infer_first(variables, img, meta):
        out = model.apply(variables, img, meta, train=False)
        return dfm_predict(out, cfg), out['stereo_cache']

    @jax.jit
    def infer_stream(variables, img_cur, meta, cache):
        img2 = jnp.stack([img_cur, img_cur], axis=1)
        out = model.apply(variables, img2, meta, train=False,
                          prev_stereo_cache=cache)
        return dfm_predict(out, cfg), out['stereo_cache']

    return dict(model=model, cfg=cfg, infer_first=infer_first,
                infer_stream=infer_stream)
