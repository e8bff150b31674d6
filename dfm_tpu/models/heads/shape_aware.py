"""Shape-aware grouping anchor head (SSN-style) — flax.

Equivalent of the reference's `BaseShapeHead` + `ShapeAwareHead`
(mmdet3d/models/dense_heads/shape_aware_head.py:17-547): object classes
are grouped by shape into tasks; each task owns a small conv branch
(its own channels/strides, so tiny objects keep resolution while huge
objects see more context), and every branch emits per-anchor FLAT
predictions which are concatenated across tasks — anchors of different
classes may live on different featmap sizes.

Static-shape port: the per-class flat anchor arrays (built by the
caller from each task's featmap size) define the prediction layout;
loss is per-class MaxIoU assignment (the reference's
`assign_per_class=True`) reusing `anchor_targets_single_class`, and
decoding reuses the multiclass rotated NMS.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import losses as L
from ...core.coders import delta_xyzwlhr_decode
from ...core.nms import box3d_multiclass_nms
from ...core.targets import add_sin_difference, anchor_targets_single_class

__all__ = ['BaseShapeHead', 'ShapeAwareHead', 'shape_aware_loss',
           'shape_aware_get_bboxes']


class BaseShapeHead(nn.Module):
    """One task branch: shared strided convs + 1x1 cls/reg/dir.

    Output is flattened to (B, num_base_anchors * H' * W', X) in
    (anchor, y, x) order — the reference's permute(0,1,3,4,2) layout
    (shape_aware_head.py:140-158)."""
    num_cls: int
    num_base_anchors: int
    box_code_size: int = 7
    shared_conv_channels: Tuple[int, ...] = (64, 64)
    shared_conv_strides: Tuple[int, ...] = (1, 1)
    use_dir: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (c, s) in enumerate(zip(self.shared_conv_channels,
                                       self.shared_conv_strides)):
            x = nn.Conv(c, (3, 3), strides=(s, s), padding='SAME',
                        use_bias=False, dtype=self.dtype,
                        name=f'shared{i}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f'bn{i}')(x)
            x = nn.relu(x)
        b, h, w, _ = x.shape
        na = self.num_base_anchors

        def flat(t, per):
            # (B, H, W, na*per) -> (B, na, H, W, per) -> (B, na*H*W, per)
            t = t.reshape(b, h, w, na, per).transpose(0, 3, 1, 2, 4)
            return t.reshape(b, na * h * w, per)

        # focal-prior cls init (reference shape_aware_head.py init_cfg:
        # Normal std=0.01, bias_prob=0.01)
        cls = flat(nn.Conv(na * self.num_cls, (1, 1), dtype=self.dtype,
                           name='conv_cls',
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               -4.59511985013459))(x), self.num_cls)
        reg = flat(nn.Conv(na * self.box_code_size, (1, 1),
                           dtype=self.dtype, name='conv_reg')(x),
                   self.box_code_size)
        dir_p = None
        if self.use_dir:
            dir_p = flat(nn.Conv(na * 2, (1, 1), dtype=self.dtype,
                                 name='conv_dir')(x), 2)
        return cls, reg, dir_p, (h, w)


class ShapeAwareHead(nn.Module):
    """tasks: sequence of dicts with num_class, num_base_anchors,
    shared_conv_channels, shared_conv_strides. Predictions are the
    per-task flat outputs concatenated on the anchor axis."""
    tasks: Sequence[dict]
    num_classes: int = 3
    box_code_size: int = 7
    use_dir: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cls_l, reg_l, dir_l, sizes = [], [], [], []
        for i, task in enumerate(self.tasks):
            c, r, d, hw = BaseShapeHead(
                num_cls=self.num_classes,
                num_base_anchors=task['num_base_anchors'],
                box_code_size=self.box_code_size,
                shared_conv_channels=tuple(task['shared_conv_channels']),
                shared_conv_strides=tuple(task['shared_conv_strides']),
                use_dir=self.use_dir, dtype=self.dtype,
                name=f'task{i}')(x, train)
            cls_l.append(c)
            reg_l.append(r)
            dir_l.append(d)
            sizes.extend([hw] * int(task['num_class']))
        cls = jnp.concatenate(cls_l, axis=1)
        reg = jnp.concatenate(reg_l, axis=1)
        dirp = jnp.concatenate(dir_l, axis=1) if self.use_dir else None
        return cls, reg, dirp, sizes


def shape_aware_loss(preds,
                     anchors_per_class,
                     gt_boxes,
                     gt_labels,
                     gt_mask,
                     assigner_cfgs,
                     num_classes=3,
                     dir_offset=0.7854,
                     loss_weights=(1.0, 2.0, 0.2),
                     axis_name=None):
    """Per-class assignment + focal/smooth-L1/dir losses over the flat
    concatenated layout (reference ShapeAwareHead.loss,
    shape_aware_head.py:311-377).

    anchors_per_class[c] is (A_c, 7) and sum_c A_c == J.
    """
    cls_score, bbox_pred, dir_pred = preds[:3]
    b = cls_score.shape[0]
    cls_score = cls_score.astype(jnp.float32)
    bbox_pred = bbox_pred.astype(jnp.float32)
    if dir_pred is not None:
        dir_pred = dir_pred.astype(jnp.float32)

    # slice the flat axis into per-class segments
    seg = [0]
    for a in anchors_per_class:
        seg.append(seg[-1] + a.shape[0])

    def sample_targets(gt_b, gl_b, gm_b):
        ts, pos, neg = [], 0., 0.
        for c, (anchors, cfg) in enumerate(
                zip(anchors_per_class, assigner_cfgs)):
            t = anchor_targets_single_class(
                anchors, gt_b, gm_b & (gl_b == c),
                cfg['pos_iou_thr'], cfg['neg_iou_thr'], cfg['min_pos_iou'],
                class_id=c, num_classes=num_classes, dir_offset=dir_offset)
            pos = pos + t['pos_mask'].sum()
            neg = neg + (t['labels'] == num_classes).sum()
            ts.append(t)
        return ts, pos, neg

    targets, pos, neg = jax.vmap(sample_targets)(gt_boxes, gt_labels,
                                                 gt_mask)
    # FocalLoss head -> sampling=False -> num_total_samples is the
    # POSITIVE count only (mmdet shape_aware_head.py:359 via
    # anchor_head sampling rule); negatives never enter the normalizer.
    del neg
    num_total = pos.sum()
    if axis_name is not None:
        num_total = jax.lax.pmean(num_total, axis_name)
    avg = jnp.maximum(num_total, 1.0)

    terms = {'loss_cls': [], 'loss_bbox': [], 'loss_dir': []}
    for c in range(num_classes):
        t = targets[c]
        sl = slice(seg[c], seg[c + 1])
        terms['loss_cls'].append(L.sigmoid_focal_loss(
            cls_score[:, sl], t['labels'], t['label_weights'],
            avg_factor=avg))
        p_sin, t_sin = add_sin_difference(bbox_pred[:, sl],
                                          t['bbox_targets'])
        terms['loss_bbox'].append(L.smooth_l1_loss(
            p_sin, t_sin, t['bbox_weights'][..., None], beta=1.0 / 9.0,
            avg_factor=avg))
        if dir_pred is not None:
            terms['loss_dir'].append(L.softmax_cross_entropy(
                dir_pred[:, sl], t['dir_targets'], t['dir_weights'],
                avg_factor=avg))

    out = {'loss_cls': loss_weights[0] * jnp.stack(terms['loss_cls']).sum(),
           'loss_bbox': loss_weights[1] * jnp.stack(terms['loss_bbox']).sum()}
    if terms['loss_dir']:
        out['loss_dir'] = loss_weights[2] * jnp.stack(
            terms['loss_dir']).sum()
    return out


def shape_aware_get_bboxes(preds,
                           flat_anchors,
                           num_classes=3,
                           dir_offset=0.7854,
                           score_thr=0.1,
                           nms_thr=0.25,
                           nms_pre=1024,
                           max_num=500):
    """Decode + multiclass rotated NMS over the flat layout (reference
    shape_aware_head.py:430-515)."""
    import numpy as np

    from ...core.transforms import limit_period
    cls_score, bbox_pred, dir_pred = preds[:3]
    b, j = cls_score.shape[:2]
    scores = jax.nn.sigmoid(cls_score.astype(jnp.float32))
    deltas = bbox_pred.astype(jnp.float32)
    dir_score = jnp.argmax(dir_pred, axis=-1) if dir_pred is not None \
        else jnp.zeros((b, j), jnp.int32)

    def single(scores_i, deltas_i, dir_i):
        k = min(nms_pre, j)
        _, topk = jax.lax.top_k(scores_i.max(axis=-1), k)
        boxes = delta_xyzwlhr_decode(flat_anchors[topk], deltas_i[topk])
        out = box3d_multiclass_nms(
            boxes, boxes[:, [0, 1, 3, 4, 6]], scores_i[topk],
            score_thr, nms_thr, max_num, dir_scores=dir_i[topk])
        yaw = out['boxes3d'][:, 6]
        dir_rot = limit_period(yaw - dir_offset, 0.0, np.pi)
        yaw = dir_rot + dir_offset + np.pi * out['dir_scores'].astype(
            yaw.dtype)
        out['boxes3d'] = out['boxes3d'].at[:, 6].set(
            jnp.where(out['mask'], yaw, 0.0))
        return out

    return jax.vmap(single)(scores, deltas, dir_score)
