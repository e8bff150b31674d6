"""Per-family training adapters: make every registered detector
CLI-trainable through one generic loop.

The reference drives every config through `tools/train.py:116` /
`test.py:130` because mmcv's runner only needs `model.train_step(data)`
— the data dict's schema is a private contract between each dataset and
each detector. Our detectors are pure functions with per-family
(inputs, loss) signatures, so the equivalent uniform surface is an
adapter table: for each detector `type`, how to

  * pull the model's positional inputs out of a batch dict,
  * call its loss (normalized to `(total, dict)`),
  * synthesize a tiny self-consistent batch (train-smoke without data).

`tools/train.py` / `tools/test.py` dispatch through this table, so the
whole config zoo — not just DfM — trains and evaluates from the CLI.
"""

import dataclasses
from typing import Any, Callable, Optional

import numpy as np

__all__ = ['get_adapter', 'adapter_types', 'TrainAdapter']


@dataclasses.dataclass(frozen=True)
class TrainAdapter:
    """Uniform training surface for one detector family."""
    type: str
    # batch dict -> positional args for model.apply (before `train=`)
    model_args: Callable[[dict], tuple]
    # (handle, outputs, batch, rng) -> (total, losses dict)
    loss: Callable[[Any, Any, dict, Any], tuple]
    # (handle, batch_size, seed) -> batch dict at tiny shapes
    synthetic_batch: Callable[[Any, int, int], dict]
    # (handle, outputs, batch) -> detections (optional, eval smoke)
    predict: Optional[Callable[[Any, Any, dict], Any]] = None


def _gt_pack(rng, b, g=4, cam_frame=False):
    """Random-but-in-range 3D GT boxes + labels + mask."""
    import jax.numpy as jnp
    if cam_frame:
        # camera frame: x right, y down, z forward
        ctr = np.stack([rng.uniform(-8, 8, (b, g)),
                        rng.uniform(0.5, 2.0, (b, g)),
                        rng.uniform(8, 40, (b, g))], -1)
    else:
        ctr = np.stack([rng.uniform(2, 50, (b, g)),
                        rng.uniform(-20, 20, (b, g)),
                        rng.uniform(-2, 0, (b, g))], -1)
    dim = np.stack([rng.uniform(1.5, 4.2, (b, g)),
                    rng.uniform(1.4, 1.8, (b, g)),
                    rng.uniform(1.4, 1.8, (b, g))], -1)
    yaw = rng.uniform(-np.pi, np.pi, (b, g, 1))
    boxes = np.concatenate([ctr, dim, yaw], -1).astype(np.float32)
    labels = rng.integers(0, 3, (b, g))
    mask = np.ones((b, g), bool)
    return (jnp.asarray(boxes), jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(mask))


def _cam_matrix(w, h, f=360.0):
    cam = np.eye(4, dtype=np.float32)
    cam[0, 0] = cam[1, 1] = f
    cam[0, 2] = w / 2.0
    cam[1, 2] = h / 2.0
    return cam


# ---------------------------------------------------------------- DfM

def _dfm_meta(b, h, w):
    import dataclasses as dc

    import jax.numpy as jnp
    from ..models import BatchMeta
    cam = _cam_matrix(w, h, f=721.5 * w / 1280.0)
    meta = BatchMeta.identity(b, jnp.tile(jnp.asarray(cam)[None],
                                          (b, 1, 1)))
    return dc.replace(meta, org_w=jnp.full((b,), float(w)))


def _dfm_synth(handle, b, seed, h=32, w=64, full=False):
    import jax.numpy as jnp
    cfg = handle.cfg
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.standard_normal((b, 2, h, w, 3),
                                          dtype=np.float32))
    gen = cfg.anchor_generator()
    nz, ny, nx = cfg.voxel_grid_size()
    grid = gen.grid_anchors((ny, nx))
    a = np.asarray(grid[0, ny // 2, nx // 2, 0, 0])
    gt = np.concatenate([a[:6], [0.05]]).astype(np.float32)
    batch = dict(
        img=img, meta=_dfm_meta(b, h, w),
        gt_boxes=jnp.tile(jnp.asarray(gt)[None, None], (b, 1, 1)),
        gt_labels=jnp.zeros((b, 1), jnp.int32),
        gt_mask=jnp.ones((b, 1), bool),
        depth_img=jnp.asarray(
            rng.random((b, h, w), dtype=np.float32) * 50 + 3),
        depth_fgmask_img=jnp.ones((b, h, w), jnp.int32))
    if full:
        # teacher points inside the grid + 2D aux targets
        pcr = np.asarray(cfg.point_cloud_range)
        pts = rng.random((b, 512, 3)).astype(np.float32) \
            * (pcr[3:] - pcr[:3]) + pcr[:3]
        batch['points'] = jnp.asarray(pts)
        batch['point_mask'] = jnp.ones((b, 512), bool)
        batch['gt_bboxes2d'] = jnp.asarray(
            np.tile(np.array([[w * .3, h * .3, w * .6, h * .6]],
                             np.float32), (b, 1, 1)))
        batch['centers2d'] = jnp.asarray(
            np.tile(np.array([[w * .45, h * .45]], np.float32),
                    (b, 1, 1)))
    return batch


def _mk_dfm_adapter(full=False):
    def loss(handle, outputs, batch, rng):
        from ..models.detectors.dfm import dfm_loss
        if not full:
            return dfm_loss(outputs, batch, handle.cfg, rng)
        from ..models.detectors.dfm_full import dfm_full_loss
        img_hw = tuple(int(s) for s in batch['img'].shape[2:4])
        return dfm_full_loss(outputs, batch, handle.cfg,
                             handle.module.atss_cfg, img_hw, rng)

    def model_args(batch):
        if full:
            return (batch['img'], batch['meta'],
                    batch.get('points'), batch.get('point_mask'))
        return (batch['img'], batch['meta'])

    def predict(handle, outputs, batch):
        from ..models.detectors.dfm import dfm_predict
        return dfm_predict(outputs, handle.cfg)

    return TrainAdapter(
        type='DfMFull' if full else 'DfM',
        model_args=model_args, loss=loss,
        synthetic_batch=lambda h, b, s: _dfm_synth(h, b, s, full=full),
        predict=predict)


# --------------------------------------------------- mono (FCOS3D/PGD)

def _mono_synth(handle, b, seed, h=64, w=96, kpts=False, flex=False):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.standard_normal((b, h, w, 3),
                                          dtype=np.float32))
    boxes, labels, mask = _gt_pack(rng, b, cam_frame=True)
    g = boxes.shape[1]
    cam = _cam_matrix(w, h, f=60.0)
    uv = np.stack([
        np.asarray(boxes[..., 0]) / np.asarray(boxes[..., 2]) * cam[0, 0]
        + cam[0, 2],
        np.asarray(boxes[..., 1]) / np.asarray(boxes[..., 2]) * cam[1, 1]
        + cam[1, 2]], -1).astype(np.float32)
    uv = np.clip(uv, 2, [w - 3, h - 3])
    wh = np.full((b, g, 2), 10.0, np.float32)
    batch = dict(
        img=img,
        cam2img=jnp.tile(jnp.asarray(cam)[None], (b, 1, 1)),
        gt_boxes_cam=boxes, gt_labels=labels, gt_mask=mask,
        centers2d=jnp.asarray(uv),
        gt_bboxes2d=jnp.asarray(
            np.concatenate([uv - wh, uv + wh], -1)),
        gt_depths=boxes[..., 2])
    if kpts:
        batch['gt_velocities'] = jnp.zeros((b, g, 2))
        batch['gt_attr_labels'] = jnp.zeros((b, g), jnp.int32)
        batch['kpts2d'] = jnp.asarray(
            rng.random((b, g, 10, 2), dtype=np.float32)
            * np.array([w - 1, h - 1], np.float32))
    if flex:
        batch['kpts2d'] = jnp.asarray(
            rng.random((b, g, 10, 2), dtype=np.float32)
            * np.array([w - 1, h - 1], np.float32))
        batch['gt_alphas'] = jnp.asarray(
            rng.uniform(-np.pi, np.pi, (b, g)).astype(np.float32))
    return batch


def _mk_mono_adapter(kind):
    def loss(handle, outputs, batch, rng):
        img_hw = tuple(int(s) for s in batch['img'].shape[1:3])
        if kind == 'fcos3d':
            from ..models.detectors.fcos_mono3d import fcos_mono3d_loss
            return fcos_mono3d_loss(outputs, img_hw, batch, handle.cfg)
        from ..models.detectors.pgd_mono3d import pgd_mono3d_loss
        return pgd_mono3d_loss(outputs, img_hw, batch, handle.cfg,
                               cam2img=batch.get('cam2img'))

    def predict(handle, outputs, batch):
        img_hw = tuple(int(s) for s in batch['img'].shape[1:3])
        from ..models.detectors.fcos_mono3d import fcos_mono3d_predict
        return fcos_mono3d_predict(outputs, img_hw, batch['cam2img'],
                                   handle.cfg)

    return TrainAdapter(
        type=kind,
        model_args=lambda b: (b['img'],), loss=loss,
        synthetic_batch=lambda h, b, s: _mono_synth(
            h, b, s, kpts=(kind == 'pgd')),
        predict=predict)


def _mk_smoke_adapter():
    def loss(handle, outputs, batch, rng):
        from ..models.detectors.smoke import smoke_loss
        losses = smoke_loss(outputs, batch, handle.cfg, batch['cam2img'])
        return sum(losses.values()), losses

    def predict(handle, outputs, batch):
        from ..models.detectors.smoke import smoke_predict
        return smoke_predict(outputs, batch['cam2img'], handle.cfg)

    return TrainAdapter(
        type='SMOKEMono3D', model_args=lambda b: (b['img'],), loss=loss,
        synthetic_batch=lambda h, b, s: _mono_synth(h, b, s),
        predict=predict)


def _mk_monoflex_adapter():
    def loss(handle, outputs, batch, rng):
        from ..models.heads.monoflex import monoflex_loss
        losses = monoflex_loss(outputs, batch, handle.cfg,
                               batch['cam2img'][0])
        return sum(losses.values()), losses

    def predict(handle, outputs, batch):
        from ..models.detectors.monoflex import monoflex_predict
        return monoflex_predict(outputs, batch['cam2img'], handle.cfg)

    return TrainAdapter(
        type='MonoFlex', model_args=lambda b: (b['img'],), loss=loss,
        synthetic_batch=lambda h, b, s: _mono_synth(h, b, s, flex=True),
        predict=predict)


# ----------------------------------------------------- LiDAR families

def _points_synth(handle, b, seed, n=512):
    import jax.numpy as jnp
    cfg = handle.cfg
    rng = np.random.default_rng(seed)
    pcr = np.asarray(cfg.point_cloud_range, np.float32)
    pts = rng.random((b, n, 3)).astype(np.float32) \
        * (pcr[3:] - pcr[:3]) + pcr[:3]
    boxes, labels, mask = _gt_pack(rng, b)
    # clamp GT into the range so assignment finds positives
    lo = pcr[:3] + np.asarray(boxes[..., 3:6]) / 2
    hi = pcr[3:] - np.asarray(boxes[..., 3:6]) / 2
    ctr = np.clip(np.asarray(boxes[..., :3]), lo, np.maximum(lo, hi))
    boxes = jnp.asarray(np.concatenate(
        [ctr, np.asarray(boxes[..., 3:])], -1))
    return dict(points=jnp.asarray(pts),
                point_mask=jnp.ones((b, n), bool),
                gt_boxes=boxes, gt_labels=labels, gt_mask=mask)


def _mk_lidar_adapter(kind):
    def loss(handle, outputs, batch, rng):
        if kind == 'centerpoint':
            from ..models.detectors.centerpoint import centerpoint_loss
            losses = centerpoint_loss(outputs, batch, handle.cfg)
            return sum(losses.values()), losses
        if kind == 'sassd':
            from ..models.detectors.sassd import sassd_loss as fn
        elif kind == 'dynamic_voxelnet':
            from ..models.detectors.dynamic_voxelnet import \
                dynamic_voxelnet_loss as fn
        else:
            from ..models.detectors.voxelnet import voxelnet_loss as fn
        return fn(outputs, batch, handle.cfg)

    def predict(handle, outputs, batch):
        if kind == 'centerpoint':
            from ..models.detectors.centerpoint import centerpoint_predict
            return centerpoint_predict(outputs, handle.cfg)
        from ..models.detectors.voxelnet import voxelnet_predict
        return voxelnet_predict(outputs, handle.cfg)

    return TrainAdapter(
        type=kind,
        model_args=lambda b: (b['points'], b['point_mask']), loss=loss,
        synthetic_batch=_points_synth, predict=predict)


def _mk_votenet_adapter():
    def loss(handle, outputs, batch, rng):
        from ..models.detectors.votenet import votenet_loss
        return votenet_loss(outputs, batch, handle.cfg)

    def predict(handle, outputs, batch):
        from ..models.detectors.votenet import votenet_predict
        return votenet_predict(outputs, handle.cfg)

    def synth(handle, b, seed, n=256):
        # indoor scene: depth-frame points/boxes in a small room cube
        # (VoteNetConfig has no point_cloud_range — SUN RGB-D scenes
        # are unbounded; the backbone works on raw xyz)
        import jax.numpy as jnp
        rng = np.random.default_rng(seed)
        pts = rng.random((b, n, 3)).astype(np.float32) * 6.0
        g = 4
        ctr = rng.random((b, g, 3)).astype(np.float32) * 5.0 + 0.5
        dim = rng.uniform(0.5, 1.2, (b, g, 3)).astype(np.float32)
        yaw = rng.uniform(-np.pi, np.pi, (b, g, 1)).astype(np.float32)
        return dict(
            points=jnp.asarray(pts),
            gt_boxes=jnp.asarray(np.concatenate([ctr, dim, yaw], -1)),
            gt_labels=jnp.asarray(rng.integers(
                0, handle.cfg.num_classes, (b, g)).astype(np.int32)),
            gt_mask=jnp.ones((b, g), bool))

    return TrainAdapter(
        type='VoteNet', model_args=lambda b: (b['points'],), loss=loss,
        synthetic_batch=synth, predict=predict)


# ------------------------------------------------- multi-view lifting

def _mv_synth(handle, b, seed, h=32, w=48, n_views=2):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    cfg = handle.cfg
    # lidar (x fwd, y left, z up) -> camera (z fwd) -> pixels
    rot = np.array([[0, -1, 0, 0], [0, 0, -1, 0],
                    [1, 0, 0, 0], [0, 0, 0, 1]], np.float32)
    cam = _cam_matrix(w, h, f=30.0) @ rot
    boxes, labels, mask = _gt_pack(rng, b)
    if handle.type == 'ImVoxelNet':
        img = jnp.asarray(rng.standard_normal((b, h, w, 3),
                                              dtype=np.float32))
        l2i = jnp.tile(jnp.asarray(cam)[None], (b, 1, 1))
    else:
        # (B, F=1, V, H, W, 3) multi-view frame stack
        img = jnp.asarray(
            rng.standard_normal((b, 1, n_views, h, w, 3),
                                dtype=np.float32))
        l2i = jnp.tile(jnp.asarray(cam)[None, None, None],
                       (b, 1, n_views, 1, 1))
    pcr = np.asarray(cfg.voxel_range, np.float32)
    lo = pcr[:3] + np.asarray(boxes[..., 3:6]) / 2
    hi = pcr[3:] - np.asarray(boxes[..., 3:6]) / 2
    ctr = np.clip(np.asarray(boxes[..., :3]), lo, np.maximum(lo, hi))
    boxes = jnp.asarray(
        np.concatenate([ctr, np.asarray(boxes[..., 3:])], -1))
    return dict(img=img, lidar2img=l2i, gt_boxes=boxes,
                gt_labels=labels, gt_mask=mask)


def _mk_mv_adapter(kind):
    def model_args(batch):
        hw = tuple(int(s) for s in batch['img'].shape[-3:-1])
        return (batch['img'], batch['lidar2img'], hw)

    def loss(handle, outputs, batch, rng):
        if kind == 'ImVoxelNet':
            from ..models.detectors.imvoxelnet import imvoxelnet_loss
            return imvoxelnet_loss(outputs, batch, handle.cfg)
        from ..models.detectors.multiview_dfm import mvdfm_loss
        return mvdfm_loss(outputs, batch, handle.cfg, rng)

    def predict(handle, outputs, batch):
        if kind == 'ImVoxelNet':
            from ..models.detectors.imvoxelnet import imvoxelnet_predict
            return imvoxelnet_predict(outputs, handle.cfg)
        from ..models.detectors.multiview_dfm import mvdfm_predict
        return mvdfm_predict(outputs, handle.cfg)

    return TrainAdapter(
        type=kind, model_args=model_args, loss=loss,
        synthetic_batch=_mv_synth, predict=predict)


def _mk_ssd3d_adapter():
    def loss(handle, outputs, batch, rng):
        from ..models.detectors.ssd3d import ssd3d_loss
        return ssd3d_loss(outputs, batch, handle.cfg)

    def predict(handle, outputs, batch):
        from ..models.detectors.ssd3d import ssd3d_predict
        return ssd3d_predict(outputs, handle.cfg)

    def synth(handle, b, seed, n=1024):
        batch = _points_synth(handle, b, seed, n=n)
        import jax.numpy as jnp
        # 3DSSD consumes raw xyz (+ optional intensity): add a feature
        pts = batch['points']
        batch['points'] = jnp.concatenate(
            [pts, jnp.zeros(pts.shape[:-1] + (1,), pts.dtype)], -1)
        return batch

    return TrainAdapter(
        type='SSD3DNet', model_args=lambda b: (b['points'],),
        loss=loss, synthetic_batch=synth, predict=predict)


def _mk_groupfree3d_adapter():
    def loss(handle, outputs, batch, rng):
        from ..models.detectors.groupfree3d import groupfree3d_loss
        return groupfree3d_loss(outputs, batch, handle.cfg)

    def predict(handle, outputs, batch):
        from ..models.detectors.groupfree3d import groupfree3d_predict
        return groupfree3d_predict(outputs, handle.cfg)

    def synth(handle, b, seed, n=1024):
        # indoor room cube (ScanNet-style, axis-aligned)
        import jax.numpy as jnp
        rng = np.random.default_rng(seed)
        pts = rng.random((b, n, 3)).astype(np.float32) * 6.0
        g = 4
        ctr = rng.random((b, g, 3)).astype(np.float32) * 5.0 + 0.5
        dim = rng.uniform(0.5, 1.5, (b, g, 3)).astype(np.float32)
        boxes = np.concatenate(
            [ctr - dim * [0, 0, 0.5], dim, np.zeros((b, g, 1),
                                                    np.float32)], -1)
        return dict(
            points=jnp.asarray(pts),
            gt_boxes=jnp.asarray(boxes.astype(np.float32)),
            gt_labels=jnp.asarray(rng.integers(
                0, handle.cfg.num_classes, (b, g)).astype(np.int32)),
            gt_mask=jnp.ones((b, g), bool))

    return TrainAdapter(
        type='GroupFree3DNet', model_args=lambda b: (b['points'],),
        loss=loss, synthetic_batch=synth, predict=predict)


def _mk_point_rcnn_adapter():
    def loss(handle, outputs, batch, rng):
        from ..models.detectors.point_rcnn import point_rcnn_loss
        return point_rcnn_loss(outputs, batch, handle.cfg, rng)

    def predict(handle, outputs, batch):
        from ..models.detectors.point_rcnn import point_rcnn_predict
        return point_rcnn_predict(outputs, handle.cfg)

    def synth(handle, b, seed, n=4096):
        batch = _points_synth(handle, b, seed, n)
        del batch['point_mask']
        return batch

    return TrainAdapter(
        type='PointRCNN', model_args=lambda b: (b['points'],),
        loss=loss, synthetic_batch=synth, predict=predict)


def _mk_imvotenet_adapter():
    def loss(handle, outputs, batch, rng):
        from ..models.detectors.imvotenet import imvotenet_loss
        return imvotenet_loss(outputs, batch, handle.cfg)

    def predict(handle, outputs, batch):
        from ..models.detectors.imvotenet import imvotenet_predict
        return imvotenet_predict(outputs, handle.cfg)

    def synth(handle, b, seed, n=256, h=48, w=64, m=6):
        import jax.numpy as jnp
        rng = np.random.default_rng(seed)
        pts = rng.random((b, n, 3)).astype(np.float32) * 6.0
        g = 4
        ctr = rng.random((b, g, 3)).astype(np.float32) * 5.0 + 0.5
        dim = rng.uniform(0.5, 1.2, (b, g, 3)).astype(np.float32)
        yaw = rng.uniform(-np.pi, np.pi, (b, g, 1)).astype(np.float32)
        img = rng.integers(0, 255, (b, h, w, 3)).astype(np.float32)
        boxes2d = np.zeros((b, m, 6), np.float32)
        boxes2d[:, :3, :4] = rng.uniform(0, 20, (b, 3, 4))
        boxes2d[:, :3, 2:4] += 20
        boxes2d[:, :3, 4] = rng.uniform(0.3, 0.9, (b, 3))
        boxes2d[:, :3, 5] = rng.integers(
            0, handle.cfg.num_classes, (b, 3))
        d2i = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
        d2i[:, 0, 0] = d2i[:, 1, 1] = 50.0
        d2i[:, 0, 2] = w / 2
        d2i[:, 1, 2] = h / 2
        return dict(
            points=jnp.asarray(pts), img=jnp.asarray(img),
            bboxes_2d=jnp.asarray(boxes2d), depth2img=jnp.asarray(d2i),
            gt_boxes=jnp.asarray(np.concatenate([ctr, dim, yaw], -1)),
            gt_labels=jnp.asarray(rng.integers(
                0, handle.cfg.num_classes, (b, g)).astype(np.int32)),
            gt_mask=jnp.ones((b, g), bool))

    return TrainAdapter(
        type='ImVoteNet',
        model_args=lambda b: (b['points'], b['img'], b['bboxes_2d'],
                              b['depth2img']),
        loss=loss, synthetic_batch=synth, predict=predict)


def _mk_mvx_adapter(t):
    def loss(handle, outputs, batch, rng):
        from ..models.detectors.mvx_two_stage import mvx_loss
        return mvx_loss(outputs, batch, handle.cfg)

    def predict(handle, outputs, batch):
        from ..models.detectors.mvx_two_stage import mvx_predict
        return mvx_predict(outputs, handle.cfg)

    def synth(handle, b, seed, n=512, h=64, w=96):
        import jax.numpy as jnp
        batch = _points_synth(handle, b, seed, n)
        rng = np.random.default_rng(seed + 7)
        img = rng.random((b, h, w, 3)).astype(np.float32)
        l2i = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
        l2i[:, 0, 0] = l2i[:, 1, 1] = 40.0
        l2i[:, 0, 3] = w / 2
        l2i[:, 1, 3] = h / 2
        batch['img'] = jnp.asarray(img)
        batch['lidar2img'] = jnp.asarray(l2i)
        return batch

    return TrainAdapter(
        type=t,
        model_args=lambda b: (b['points'], b['point_mask'], b['img'],
                              b['lidar2img']),
        loss=loss, synthetic_batch=synth, predict=predict)


def _mk_parta2_adapter():
    def loss(handle, outputs, batch, rng):
        from ..models.detectors.parta2 import parta2_loss
        return parta2_loss(outputs, batch, handle.cfg)

    def predict(handle, outputs, batch):
        from ..models.detectors.parta2 import parta2_predict
        return parta2_predict(outputs, handle.cfg)

    return TrainAdapter(
        type='PartA2',
        model_args=lambda b: (b['points'], b['point_mask']),
        loss=loss, synthetic_batch=_points_synth, predict=predict)


def _mk_h3dnet_adapter():
    def loss(handle, outputs, batch, rng):
        from ..models.detectors.h3dnet import h3dnet_loss
        return h3dnet_loss(outputs, batch, handle.cfg)

    def predict(handle, outputs, batch):
        from ..models.detectors.h3dnet import h3dnet_predict
        return h3dnet_predict(outputs, handle.cfg)

    # same indoor scene synth as the votenet family
    def synth(handle, b, seed, n=256):
        return _ADAPTERS['VoteNet'].synthetic_batch(handle, b, seed, n)

    return TrainAdapter(
        type='H3DNet', model_args=lambda b: (b['points'],), loss=loss,
        synthetic_batch=synth, predict=predict)


def _mk_seg_adapter():
    """EncoderDecoder3D (semantic segmentation family)."""
    def loss(handle, outputs, batch, rng):
        from ..models.segmentors.encoder_decoder import \
            encoder_decoder3d_loss
        return encoder_decoder3d_loss(outputs, batch, handle.cfg)

    def predict(handle, outputs, batch):
        from ..models.segmentors.encoder_decoder import \
            encoder_decoder3d_predict
        return encoder_decoder3d_predict(outputs, handle.cfg)

    def synth(handle, b, seed, n=256):
        import jax.numpy as jnp
        rng = np.random.default_rng(seed)
        cfg = handle.cfg
        nfeat = 9 if cfg.use_normalized_coord else 6
        if cfg.backbone == 'DGCNNBackbone':
            nfeat = 9
        pts = rng.random((b, n, nfeat)).astype(np.float32) * 2.0
        labels = rng.integers(0, cfg.num_classes, (b, n))
        # a few ignored points exercise the loss mask
        labels[:, :4] = cfg.ignore_index
        return dict(points=jnp.asarray(pts),
                    seg_labels=jnp.asarray(labels.astype(np.int32)))

    return TrainAdapter(
        type='EncoderDecoder3D', model_args=lambda b: (b['points'],),
        loss=loss, synthetic_batch=synth, predict=predict)


_ADAPTERS = {
    'DfM': _mk_dfm_adapter(full=False),
    'EncoderDecoder3D': _mk_seg_adapter(),
    'DfMFull': _mk_dfm_adapter(full=True),
    'FCOSMono3D': _mk_mono_adapter('fcos3d'),
    'PGD': _mk_mono_adapter('pgd'),
    'SMOKEMono3D': _mk_smoke_adapter(),
    'MonoFlex': _mk_monoflex_adapter(),
    'VoxelNet': _mk_lidar_adapter('voxelnet'),
    'DynamicVoxelNet': _mk_lidar_adapter('dynamic_voxelnet'),
    'CenterPoint': _mk_lidar_adapter('centerpoint'),
    'SASSD': _mk_lidar_adapter('sassd'),
    'VoteNet': _mk_votenet_adapter(),
    'SSD3DNet': _mk_ssd3d_adapter(),
    'PointRCNN': _mk_point_rcnn_adapter(),
    'ImVoteNet': _mk_imvotenet_adapter(),
    'H3DNet': _mk_h3dnet_adapter(),
    'MVXFasterRCNN': _mk_mvx_adapter('MVXFasterRCNN'),
    'PartA2': _mk_parta2_adapter(),
    'DynamicMVXFasterRCNN': _mk_mvx_adapter('DynamicMVXFasterRCNN'),
    'GroupFree3DNet': _mk_groupfree3d_adapter(),
    'ImVoxelNet': _mk_mv_adapter('ImVoxelNet'),
    'MultiViewDfM': _mk_mv_adapter('MultiViewDfM'),
}


def adapter_types():
    return sorted(_ADAPTERS)


def get_adapter(detector_type: str) -> TrainAdapter:
    if detector_type not in _ADAPTERS:
        raise KeyError(
            f'no train adapter for detector type {detector_type!r}; '
            f'available: {adapter_types()}')
    return _ADAPTERS[detector_type]
