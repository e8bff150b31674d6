"""CenterPoint head (flax / functional, static shapes).

Equivalent of the reference's `CenterHead` + `SeparateHead`
(mmdet3d/models/dense_heads/centerpoint_head.py:19-122,244-360) and its
coder/NMS utilities (`CenterPointBBoxCoder`, `circle_nms`):

* shared 3x3 conv, then per task a separate head with branches
  reg(2) / height(1) / dim(3) / rot(2) [/ vel(2)] / heatmap(classes),
  each branch = (num_conv - 1) ConvModules + a biased final conv
  (heatmap final bias init -2.19);
* gaussian heatmap targets with the CornerNet radius rule, drawn over
  a fixed `max_objs` budget (the reference also caps at max_objs —
  static shapes are native here);
* GaussianFocalLoss + masked L1 on the regression stack at GT centers;
* decode: 3x3 local-max suppression + static top-k, then circular NMS
  (centerpoint_head.py get_bboxes -> box3d_nms.circle_nms).
"""

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..layers import ConvNorm

__all__ = ['CenterHeadConfig', 'CenterHead', 'center_head_targets',
           'center_head_loss', 'center_head_decode', 'circle_nms_mask',
           'gaussian_radius']


@dataclasses.dataclass(frozen=True)
class CenterHeadConfig:
    tasks: Tuple[Tuple[str, ...], ...] = (('Car',), ('Pedestrian',
                                                     'Cyclist'))
    share_conv_channel: int = 64
    head_conv: int = 64
    final_kernel: int = 3
    num_heatmap_convs: int = 2
    with_vel: bool = False
    norm_bbox: bool = True          # dims predicted in log space
    max_objs: int = 100
    gaussian_overlap: float = 0.1
    min_radius: int = 2
    out_size_factor: int = 1
    voxel_size: Tuple[float, float] = (0.2, 0.2)
    pc_range: Tuple[float, float] = (0.0, -40.0)   # (x0, y0)
    # decode / NMS
    max_per_task: int = 50
    score_thr: float = 0.1
    circle_nms_thr: float = 4.0     # squared center distance

    @property
    def num_tasks(self):
        return len(self.tasks)


class SeparateHead(nn.Module):
    heads: Sequence[Tuple[str, int, int]]   # (name, out_ch, num_conv)
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = {}
        k = self.final_kernel
        for name, ch, num_conv in self.heads:
            f = x
            for i in range(num_conv - 1):
                f = ConvNorm(self.head_conv, (k, k), norm=self.norm,
                             use_bias=True, dtype=self.dtype,
                             name=f'{name}_conv{i}')(f, train)
            bias_init = nn.initializers.constant(self.init_bias) \
                if name == 'heatmap' else nn.initializers.zeros
            out[name] = nn.Conv(ch, (k, k), use_bias=True,
                                bias_init=bias_init, dtype=self.dtype,
                                name=f'{name}_final')(f)
        return out


class CenterHead(nn.Module):
    cfg: CenterHeadConfig = dataclasses.field(
        default_factory=CenterHeadConfig)
    norm: str = 'bn'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bev, train: bool = False):
        """bev: (B, Ny, Nx, C) -> list of per-task branch dicts."""
        cfg = self.cfg
        x = ConvNorm(cfg.share_conv_channel, (3, 3), norm=self.norm,
                     use_bias=True, dtype=self.dtype,
                     name='shared_conv')(bev, train)
        outs = []
        for t, classes in enumerate(cfg.tasks):
            heads = [('reg', 2, 2), ('height', 1, 2), ('dim', 3, 2),
                     ('rot', 2, 2)]
            if cfg.with_vel:
                heads.append(('vel', 2, 2))
            heads.append(('heatmap', len(classes), cfg.num_heatmap_convs))
            outs.append(SeparateHead(
                heads=heads, head_conv=cfg.head_conv,
                final_kernel=cfg.final_kernel, norm=self.norm,
                dtype=self.dtype, name=f'task{t}')(x, train))
        return outs


def gaussian_radius(det_size, min_overlap=0.1):
    """CornerNet radius (mmdet3d core/utils/gaussian.py semantics)."""
    h, w = det_size[..., 0], det_size[..., 1]
    a1 = 1.0
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0.0))) / 2
    a2 = 4.0
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 - jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0.0))) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.0))) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def center_head_targets(gt_boxes, gt_labels, gt_mask, task_classes,
                        featmap_size, cfg: CenterHeadConfig):
    """Targets for one task of one sample.

    Args:
        gt_boxes: (G, 7[+2]) lidar bottom-center boxes.
        gt_labels: (G,) GLOBAL class ids; task_classes: tuple of global
            ids belonging to this task.
        featmap_size: (Ny, Nx).

    Returns:
        heatmap (Ny, Nx, C_task), anno_boxes (max_objs, 8[+2]),
        inds (max_objs,), mask (max_objs,).
    """
    ny, nx = featmap_size
    g = gt_boxes.shape[0]
    vx, vy = cfg.voxel_size
    fac = cfg.out_size_factor

    in_task = jnp.zeros(g, bool)
    local_cls = jnp.zeros(g, jnp.int32)
    for li, c in enumerate(task_classes):
        sel = gt_labels == c
        in_task |= sel
        local_cls = jnp.where(sel, li, local_cls)
    valid = in_task & gt_mask

    cx = (gt_boxes[:, 0] - cfg.pc_range[0]) / (vx * fac)
    cy = (gt_boxes[:, 1] - cfg.pc_range[1]) / (vy * fac)
    wl = jnp.stack([gt_boxes[:, 4] / (vy * fac),
                    gt_boxes[:, 3] / (vx * fac)], -1)
    radius = jnp.maximum(gaussian_radius(wl, cfg.gaussian_overlap),
                         float(cfg.min_radius))
    xi = jnp.clip(jnp.floor(cx), 0, nx - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.floor(cy), 0, ny - 1).astype(jnp.int32)
    inside = (cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
    valid = valid & inside

    # draw all gaussians vectorized: (G, Ny, Nx), max-composited per cls
    gy = jnp.arange(ny, dtype=jnp.float32)[None, :, None]
    gx = jnp.arange(nx, dtype=jnp.float32)[None, None, :]
    d2 = (gx - xi[:, None, None])**2 + (gy - yi[:, None, None])**2
    sigma = ((2 * radius + 1) / 6.0)[:, None, None]
    gauss = jnp.exp(-d2 / (2 * sigma**2))
    gauss = jnp.where((d2 <= radius[:, None, None]**2) &
                      valid[:, None, None], gauss, 0.0)
    heatmap = jnp.zeros((len(task_classes), ny, nx))
    for li in range(len(task_classes)):
        m = (local_cls == li)[:, None, None]
        heatmap = heatmap.at[li].set(
            jnp.max(jnp.where(m, gauss, 0.0), axis=0))
    heatmap = heatmap.transpose(1, 2, 0)                  # (Ny, Nx, C)

    # regression targets at the first max_objs valid boxes
    order = jnp.argsort(~valid)                           # valid first
    take = order[:cfg.max_objs]
    mask = valid[take]
    rot = gt_boxes[take, 6]
    anno = [cx[take] - xi[take], cy[take] - yi[take],
            gt_boxes[take, 2],
            jnp.log(jnp.maximum(gt_boxes[take, 3], 1e-3))
            if cfg.norm_bbox else gt_boxes[take, 3],
            jnp.log(jnp.maximum(gt_boxes[take, 4], 1e-3))
            if cfg.norm_bbox else gt_boxes[take, 4],
            jnp.log(jnp.maximum(gt_boxes[take, 5], 1e-3))
            if cfg.norm_bbox else gt_boxes[take, 5],
            jnp.sin(rot), jnp.cos(rot)]
    if cfg.with_vel and gt_boxes.shape[1] >= 9:
        anno += [gt_boxes[take, 7], gt_boxes[take, 8]]
    anno_boxes = jnp.stack(anno, -1)
    inds = yi[take] * nx + xi[take]
    return heatmap, anno_boxes, inds, mask


def gaussian_focal_loss(pred_sigmoid, gt_heatmap, alpha=2.0, gamma=4.0):
    eps = 1e-6
    pos = (gt_heatmap >= 1.0 - 1e-6).astype(jnp.float32)
    neg_w = jnp.power(1 - gt_heatmap, gamma)
    pos_loss = -jnp.log(pred_sigmoid + eps) * \
        jnp.power(1 - pred_sigmoid, alpha) * pos
    neg_loss = -jnp.log(1 - pred_sigmoid + eps) * \
        jnp.power(pred_sigmoid, alpha) * neg_w * (1 - pos)
    num_pos = jnp.maximum(pos.sum(), 1.0)
    return (pos_loss.sum() + neg_loss.sum()) / num_pos


def center_head_loss(task_outs, batch, cfg: CenterHeadConfig,
                     task_class_ids, loss_bbox_weight=0.25,
                     code_weights=None):
    """Total CenterHead loss over tasks (batched).

    Args:
        task_outs: list (per task) of branch dicts from `CenterHead`.
        batch: gt_boxes (B, G, 7[+2]), gt_labels (B, G), gt_mask (B, G).
        task_class_ids: tuple (per task) of global class-id tuples.
    """
    losses = {}
    for t, out in enumerate(task_outs):
        ny, nx = out['heatmap'].shape[1:3]
        hm, anno, inds, mask = jax.vmap(
            lambda b, l, m: center_head_targets(
                b, l, m, task_class_ids[t], (ny, nx), cfg))(
                batch['gt_boxes'], batch['gt_labels'], batch['gt_mask'])
        pred_hm = jax.nn.sigmoid(out['heatmap'].astype(jnp.float32))
        losses[f'task{t}_loss_heatmap'] = gaussian_focal_loss(pred_hm, hm)

        parts = [out['reg'], out['height'], out['dim'], out['rot']]
        if cfg.with_vel:
            parts.append(out['vel'])
        pred = jnp.concatenate(
            [p.astype(jnp.float32) for p in parts], -1)   # (B,Ny,Nx,D)
        d = pred.shape[-1]
        pred_flat = pred.reshape(pred.shape[0], ny * nx, d)
        pred_at = jnp.take_along_axis(
            pred_flat, inds[..., None].astype(jnp.int32), axis=1)
        w = mask.astype(jnp.float32)[..., None]
        if code_weights is not None:
            w = w * jnp.asarray(code_weights, jnp.float32)
        num = jnp.maximum(mask.sum().astype(jnp.float32), 1.0)
        l1 = jnp.abs(pred_at - anno) * w
        losses[f'task{t}_loss_bbox'] = loss_bbox_weight * l1.sum() / \
            (num + 1e-4)
    return losses


def circle_nms_mask(centers_xy, scores, thresh):
    """Greedy circular NMS (box3d_nms.circle_nms): keep mask over
    score-descending candidates within squared distance `thresh`."""
    n = centers_xy.shape[0]
    order = jnp.argsort(-scores)
    c = centers_xy[order]
    d2 = jnp.sum((c[:, None, :] - c[None, :, :])**2, -1)
    tri = jnp.tril(jnp.ones((n, n), bool), k=-1)   # j earlier than i

    def body(i, supp):
        # suppressed if any earlier (higher-score) kept center is near
        sup_i = jnp.any((d2[i] <= thresh) & tri[i] & ~supp)
        return supp.at[i].set(sup_i)

    supp = jnp.zeros(n, bool)
    supp = jax.lax.fori_loop(0, n, body, supp)
    keep_sorted = ~supp
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep


def center_head_decode(task_outs, cfg: CenterHeadConfig,
                       task_class_ids):
    """Decode one sample's detections across tasks.

    Returns dict with boxes_3d (T*K, 7), scores_3d, labels_3d (global
    ids), all fixed-size (padded entries score 0).
    """
    all_boxes, all_scores, all_labels = [], [], []
    vx, vy = cfg.voxel_size
    fac = cfg.out_size_factor
    for t, out in enumerate(task_outs):
        hm = jax.nn.sigmoid(out['heatmap'][0].astype(jnp.float32))
        ny, nx, c = hm.shape
        # 3x3 local-max suppression
        hmax = jax.lax.reduce_window(
            hm, -jnp.inf, jax.lax.max, (3, 3, 1), (1, 1, 1),
            [(1, 1), (1, 1), (0, 0)])
        hm = jnp.where(hm >= hmax, hm, 0.0)
        flat = hm.reshape(-1)
        k = cfg.max_per_task
        scores, idx = jax.lax.top_k(flat, k)
        cls = (idx % c).astype(jnp.int32)
        pix = idx // c
        yi = (pix // nx).astype(jnp.float32)
        xi = (pix % nx).astype(jnp.float32)

        def at(name, ch):
            f = out[name][0].astype(jnp.float32).reshape(ny * nx, ch)
            return f[pix]
        reg = at('reg', 2)
        height = at('height', 1)[:, 0]
        dim = at('dim', 3)
        rot = at('rot', 2)
        x = (xi + reg[:, 0]) * fac * vx + cfg.pc_range[0]
        y = (yi + reg[:, 1]) * fac * vy + cfg.pc_range[1]
        dims = jnp.exp(dim) if cfg.norm_bbox else dim
        yaw = jnp.arctan2(rot[:, 0], rot[:, 1])
        boxes = jnp.stack([x, y, height, dims[:, 0], dims[:, 1],
                           dims[:, 2], yaw], -1)
        keep = circle_nms_mask(jnp.stack([x, y], -1), scores,
                               cfg.circle_nms_thr)
        scores = jnp.where(keep & (scores > cfg.score_thr), scores, 0.0)
        gids = jnp.asarray(task_class_ids[t], jnp.int32)[cls]
        all_boxes.append(boxes)
        all_scores.append(scores)
        all_labels.append(gids)
    return dict(boxes_3d=jnp.concatenate(all_boxes),
                scores_3d=jnp.concatenate(all_scores),
                labels_3d=jnp.concatenate(all_labels))
