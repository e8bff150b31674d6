#!/usr/bin/env python
"""Train a dfm_tpu model (equivalent of the reference's tools/train.py).

Usage:
  python tools/train.py configs/dfm_r34_kitti_3class.py \
      --work-dir work_dirs/dfm --cfg-options optimizer.lr=5e-4

Data parallelism is automatic over all visible devices (one mesh);
resume with --auto-resume.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--work-dir', default='work_dirs/default')
    p.add_argument('--cfg-options', nargs='*', default=None)
    p.add_argument('--auto-resume', action='store_true')
    p.add_argument('--max-steps', type=int, default=None,
                   help='cap total steps (debug)')
    p.add_argument('--eval-samples', type=int, default=None,
                   help='cap val samples per eval (debug)')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--profile-steps', type=int, default=0,
                   help='capture a jax.profiler trace over the first N '
                        'steps (view in TensorBoard / xprof)')
    p.add_argument('--no-tensorboard', action='store_true')
    return p.parse_args()


def build_batch(samples, metas_cls):
    import jax.numpy as jnp
    stacked = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    meta = metas_cls(
        ori_cam2img=jnp.asarray(stacked['ori_cam2img']),
        cam2img=jnp.asarray(stacked['cam2img']),
        cur2prev=jnp.asarray(stacked['cur2prev']),
        org_w=jnp.asarray(stacked['org_w']),
        flip=jnp.asarray(stacked['flip']),
        crop_offset=jnp.asarray(stacked['crop_offset']),
        scale_factor=jnp.asarray(stacked['scale_factor']))
    return dict(
        img=jnp.asarray(stacked['img']), meta=meta,
        gt_boxes=jnp.asarray(stacked['gt_boxes']),
        gt_labels=jnp.asarray(stacked['gt_labels']),
        gt_mask=jnp.asarray(stacked['gt_mask']),
        depth_img=jnp.asarray(stacked['depth_img']),
        depth_fgmask_img=jnp.asarray(stacked['depth_fgmask_img']))


def main():
    args = parse_args()
    os.makedirs(args.work_dir, exist_ok=True)

    from dfm_tpu.utils.env import setup_platform
    setup_platform()
    import jax
    from dfm_tpu.data.kitti import KittiDataset
    from dfm_tpu.models import BatchMeta, DfM, DfMConfig, dfm_loss
    from dfm_tpu.parallel import create_mesh, replicate, shard_batch
    from dfm_tpu.runtime import (CheckpointManager, create_train_state,
                                 liga_schedule, make_optimizer,
                                 make_train_step)
    from dfm_tpu.runtime.config import load_config, merge_options

    cfg = merge_options(load_config(args.config), args.cfg_options)
    cfg.dump(os.path.join(args.work_dir, 'config.json'))

    m = cfg.model.to_dict()
    m.pop('type', None)
    mcfg = DfMConfig(
        **{k: v for k, v in m.items()
           if k in {f.name for f in dataclasses.fields(DfMConfig)}})
    model = DfM(cfg=mcfg)

    d = cfg.data
    ds = KittiDataset(
        d.data_root, os.path.join(d.data_root, 'kitti_infos_train.pkl'),
        train=True,
        pipeline_kwargs=dict(crop_size=tuple(d.crop_size),
                             scale_range=tuple(d.scale_range),
                             flip_ratio=d.flip_ratio, max_gt=d.max_gt))

    mesh = create_mesh()
    n_dev = len(jax.devices())
    batch_size = d.batch_size_per_chip * n_dev
    steps_per_epoch = max(len(ds) // batch_size, 1)
    total_steps = steps_per_epoch * cfg.schedule.total_epochs

    sched = liga_schedule(
        cfg.optimizer.lr, cfg.optimizer.warmup_iters,
        cfg.optimizer.warmup_ratio,
        decay_steps=[e * steps_per_epoch for e in cfg.optimizer.decay_epochs],
        gamma=cfg.optimizer.gamma)
    tx = make_optimizer(sched, cfg.optimizer.weight_decay,
                        cfg.optimizer.grad_clip_norm)

    rng = np.random.default_rng(args.seed)
    sample0 = ds.get_sample(0, rng)
    batch0 = build_batch([sample0] * batch_size, BatchMeta)

    import jax.numpy as jnp
    variables = model.init(jax.random.PRNGKey(args.seed), batch0['img'],
                           batch0['meta'], train=False)
    state = create_train_state(variables, tx)

    ckpt = CheckpointManager(os.path.join(args.work_dir, 'ckpts'),
                             max_keep=cfg.checkpoint.max_keep)
    start_step = 0
    if args.auto_resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        start_step = int(state.step)
        print(f'resumed from step {start_step}')

    train_step = make_train_step(
        model, lambda o, bt, r: dfm_loss(o, bt, mcfg, r))

    # EvalHook equivalent: run KITTI eval on the val split periodically
    val_info = os.path.join(d.data_root, 'kitti_infos_val.pkl')
    val_ds = None
    if os.path.exists(val_info):
        val_ds = KittiDataset(
            d.data_root, val_info, train=False,
            pipeline_kwargs=dict(crop_size=tuple(d.crop_size),
                                 max_gt=d.max_gt))

    def run_eval(state):
        if val_ds is None:
            return
        from dfm_tpu.apis import dataset_inference, init_dfm_model
        from dfm_tpu.evaluation import kitti_eval
        handle = init_dfm_model(mcfg, dtype=jnp.float32)
        variables_eval = {'params': state.params,
                          'batch_stats': state.batch_stats}
        n = args.eval_samples or len(val_ds)
        dt_annos = dataset_inference(handle, variables_eval, val_ds,
                                     max_samples=n)
        gt_annos = []
        for info in val_ds.infos[:n]:
            a = info['annos']
            pl = a['gt_boxes_pl']
            gt_annos.append(dict(
                name=np.asarray(a['names']), truncated=a['truncated'],
                occluded=a['occluded'], bbox=a['bbox2d'],
                dimensions=np.stack([pl[:, 3], pl[:, 5], pl[:, 4]], 1),
                location=np.stack([-pl[:, 1], -pl[:, 2], pl[:, 0]], 1),
                rotation_y=-pl[:, 6] - np.pi / 2))
        res = kitti_eval(gt_annos, dt_annos)
        for k in sorted(res):
            if '3d_moderate' in k:
                print(f'[eval] {k}: {res[k]:.4f}', flush=True)

    from dfm_tpu.runtime.logging import MetricsLogger, profile_trace
    logger = MetricsLogger(args.work_dir,
                           use_tensorboard=not args.no_tensorboard)

    # multi-host: every process loads only its shard of each epoch and
    # contributes its slice of the global batch
    # (dfm_tpu/parallel/multihost.py; single-host degenerates cleanly)
    from dfm_tpu.parallel.multihost import (broadcast_seed,
                                            global_batch_from_local,
                                            host_shard_indices,
                                            local_batch_size)
    multi_host = jax.process_count() > 1
    seed = broadcast_seed(args.seed)
    feed_batch = local_batch_size(batch_size, mesh) if multi_host \
        else batch_size

    with mesh:
        state = replicate(state, mesh)
        key = jax.random.PRNGKey(seed)
        t0 = time.time()
        step = start_step
        epoch_no = 0
        if multi_host:
            order = host_shard_indices(len(ds), epoch_no, seed)
        else:
            order = rng.permutation(len(ds))
        cursor = 0
        max_steps = args.max_steps or total_steps
        profiling = args.profile_steps > 0
        prof_ctx = profile_trace(args.work_dir, enabled=profiling)
        if profiling:
            prof_ctx.__enter__()
        while step < max_steps:
            idxs = []
            while len(idxs) < feed_batch:
                if cursor >= len(order):
                    epoch_no += 1
                    order = host_shard_indices(len(ds), epoch_no, seed) \
                        if multi_host else rng.permutation(len(ds))
                    cursor = 0
                idxs.append(int(order[cursor]))
                cursor += 1
            samples = [ds.get_sample(i, rng) for i in idxs]
            local = build_batch(samples, BatchMeta)
            batch = global_batch_from_local(local, mesh) if multi_host \
                else shard_batch(local, mesh)
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batch, sub)
            step += 1
            if profiling and step - start_step >= args.profile_steps:
                jax.block_until_ready(metrics)
                prof_ctx.__exit__(None, None, None)
                profiling = False
                print(f'profile trace saved to {args.work_dir}/profile')
            if step % cfg.schedule.log_interval == 0 or step == 1:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t0
                m['s_per_iter'] = dt / max(step - start_step, 1)
                logger.log(step, m)
                print(f'step {step}/{max_steps} '
                      f'({m["s_per_iter"]:.2f}s/it) ' +
                      ' '.join(f'{k}={v:.4f}' for k, v in m.items()),
                      flush=True)
            if step % (cfg.checkpoint.interval_epochs *
                       steps_per_epoch) == 0:
                ckpt.save(step, jax.device_get(state))
                if step % (cfg.schedule.eval_interval *
                           steps_per_epoch) == 0:
                    run_eval(state)
        ckpt.save(step, jax.device_get(state), force=True)
    logger.close()
    print('training done')


if __name__ == '__main__':
    main()
