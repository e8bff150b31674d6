"""PointRCNN two-stage point-based detector (flax, static shapes).

Equivalent of the reference's `PointRCNN`
(mmdet3d/models/detectors/point_rcnn.py:9-95) with
`PointRPNHead` (dense_heads/point_rpn_head.py:15-381),
`PointNetFPNeck`, `PointRCNNRoIHead` + `PointRCNNBboxHead`
(roi_heads/point_rcnn_roi_head.py, bbox_heads/point_rcnn_bbox_head.py)
and the `PointXYZWHLRBBoxCoder`
(core/bbox/coders/point_xyzwhlr_bbox_coder.py:10-130).

TPU-first design:
  * one jittable __call__ runs BOTH stages — proposals come from a
    static-shape class-agnostic rotated NMS (top `num_proposals`
    slots + validity mask) instead of dynamic per-image lists;
  * RoI point pooling is a static top-K selection of in-box points
    (pad-by-repeat like the reference's RoIPointPool3d);
  * RoI assignment/sampling (MaxIoU + IoUNegPiecewiseSampler) runs
    inside the train step on fixed-size tensors.

Hyperparameters follow configs/_base_/models/point_rcnn.py.
"""

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.coders import delta_xyzwlhr_decode, delta_xyzwlhr_encode
from ...core.iou import rotated_iou_3d
from ...core.losses import sigmoid_focal_loss, smooth_l1_loss
from ...core.nms import nms_bev
from ..backbones.pointnet2 import SAModule
from ..backbones.pointnet2_msg import PointNet2SAMSG
from ..necks.pointnet2_fp import PointNetFPNeck

__all__ = ['PointRCNN', 'PointRCNNConfig', 'point_rcnn_loss',
           'point_rcnn_predict', 'point_coder_encode',
           'point_coder_decode']


@dataclasses.dataclass(frozen=True)
class PointRCNNConfig:
    num_classes: int = 3
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    mean_sizes: Tuple[Tuple[float, float, float], ...] = (
        (3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73))
    enlarge_width: float = 0.1
    num_proposals: int = 128          # static nms_post (ref 512)
    rpn_nms_thr: float = 0.8
    roi_num_points: int = 512
    cls_pos_thr: float = 0.7
    cls_neg_thr: float = 0.25
    reg_pos_thr: float = 0.55
    depth_normalizer: float = 70.0
    score_thr: float = 0.1
    rcnn_nms_thr: float = 0.1
    max_num: int = 50
    # backbone (reference point_rcnn.py backbone block)
    sa_points: Tuple[int, ...] = (4096, 1024, 256, 64)
    sa_radii: Tuple[Tuple[float, float], ...] = (
        (0.1, 0.5), (0.5, 1.0), (1.0, 2.0), (2.0, 4.0))
    sa_samples: Tuple[Tuple[int, int], ...] = (
        (16, 32), (16, 32), (16, 32), (16, 32))


def point_coder_encode(gt_boxes, points, labels, mean_sizes):
    """PointXYZWHLRBBoxCoder.encode: (..., 8) targets.
    gt boxes use GRAVITY-center z (caller shifts)."""
    ms = jnp.asarray(mean_sizes)[labels]                  # (..., 3)
    diag = jnp.sqrt(ms[..., 0] ** 2 + ms[..., 1] ** 2)
    dims = jnp.maximum(gt_boxes[..., 3:6], 1e-5)
    xt = (gt_boxes[..., 0] - points[..., 0]) / diag
    yt = (gt_boxes[..., 1] - points[..., 1]) / diag
    zt = (gt_boxes[..., 2] - points[..., 2]) / ms[..., 2]
    dt = jnp.log(dims / ms)
    return jnp.stack([xt, yt, zt, dt[..., 0], dt[..., 1], dt[..., 2],
                      jnp.cos(gt_boxes[..., 6]),
                      jnp.sin(gt_boxes[..., 6])], axis=-1)


def point_coder_decode(enc, points, labels, mean_sizes):
    """Decode (..., 8) -> boxes (..., 7) with gravity-center z."""
    ms = jnp.asarray(mean_sizes)[labels]
    diag = jnp.sqrt(ms[..., 0] ** 2 + ms[..., 1] ** 2)
    x = enc[..., 0] * diag + points[..., 0]
    y = enc[..., 1] * diag + points[..., 1]
    z = enc[..., 2] * ms[..., 2] + points[..., 2]
    dims = jnp.exp(enc[..., 3:6]) * ms
    yaw = jnp.arctan2(enc[..., 7], enc[..., 6])
    return jnp.concatenate(
        [jnp.stack([x, y, z], -1), dims, yaw[..., None]], axis=-1)


def _points_in_boxes(points, boxes, enlarge=0.0):
    """(N, 3) x (G, 7 bottom-center) -> (N, G) bool."""
    local = points[:, None, :] - boxes[None, :, :3]
    yaw = boxes[:, 6]
    c, s = jnp.cos(-yaw), jnp.sin(-yaw)
    lx = local[..., 0] * c - local[..., 1] * s
    ly = local[..., 0] * s + local[..., 1] * c
    lz = local[..., 2]
    dx = boxes[:, 3] + 2 * enlarge
    dy = boxes[:, 4] + 2 * enlarge
    dz = boxes[:, 5] + 2 * enlarge
    return ((jnp.abs(lx) <= dx / 2) & (jnp.abs(ly) <= dy / 2) &
            (lz >= -enlarge) & (lz <= boxes[:, 5] + enlarge)) & \
        (dz[None] > 0)


class PointRCNN(nn.Module):
    cfg: PointRCNNConfig = dataclasses.field(
        default_factory=PointRCNNConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points (B, N, 3+C) -> dict with stage-1 predictions,
        proposals and stage-2 refinements."""
        cfg = self.cfg
        backbone = PointNet2SAMSG(
            num_points=tuple((p,) for p in cfg.sa_points),
            radii=cfg.sa_radii,
            num_samples=cfg.sa_samples,
            sa_channels=(((16, 16, 32), (32, 32, 64)),
                         ((64, 64, 128), (64, 96, 128)),
                         ((128, 196, 256), (128, 196, 256)),
                         ((256, 256, 512), (256, 384, 512))),
            aggregation_channels=(None, None, None, None),
            fps_mods=(('D-FPS',),) * 4,
            fps_ranges=((-1,),) * 4,
            dtype=self.dtype, name='backbone')(points, train)
        fp = PointNetFPNeck(
            fp_channels=((512, 512), (512, 512), (256, 256),
                         (128, 128)),
            dtype=self.dtype, name='neck')(backbone, train)
        feat = fp['fp_features']                       # (B, N, 128)
        xyz = fp['fp_xyz']                             # (B, N, 3)

        def mlp_head(x, widths, out, tag):
            for i, wdt in enumerate(widths):
                x = nn.relu(nn.Dense(wdt, dtype=self.dtype,
                                     name=f'{tag}{i}')(x))
            return nn.Dense(out, dtype=self.dtype, name=f'{tag}_out')(x)

        cls_pred = mlp_head(feat, (256, 256), cfg.num_classes, 'rpn_cls')
        reg_pred = mlp_head(feat, (256, 256), 8, 'rpn_reg')

        # -- proposals (class-agnostic rotated NMS, static shapes) ----
        sem = jax.nn.sigmoid(cls_pred.astype(jnp.float32))
        obj = sem.max(-1)
        lab = sem.argmax(-1)
        boxes_g = point_coder_decode(
            jax.lax.stop_gradient(reg_pred.astype(jnp.float32)),
            xyz, lab, cfg.mean_sizes)                 # gravity z
        boxes = boxes_g.at[..., 2].add(-boxes_g[..., 5] / 2)

        def nms_one(bx, sc):
            pre = min(1024, bx.shape[0])
            top_sc, top_i = jax.lax.top_k(sc, pre)
            bxp = bx[top_i]
            keep = nms_bev(bxp[:, [0, 1, 3, 4, 6]], top_sc,
                           cfg.rpn_nms_thr)
            ksc = jnp.where(keep, top_sc, -jnp.inf)
            psc, pi = jax.lax.top_k(ksc, cfg.num_proposals)
            return bxp[pi], psc, top_i[pi]

        prop_boxes, prop_scores, prop_idx = jax.vmap(nms_one)(
            jax.lax.stop_gradient(boxes), jax.lax.stop_gradient(obj))
        prop_mask = jnp.isfinite(prop_scores)
        prop_scores = jnp.where(prop_mask, prop_scores, 0.0)
        prop_labels = jnp.take_along_axis(lab, prop_idx, axis=1)

        # -- RoI stage -------------------------------------------------
        k = cfg.roi_num_points
        pts_xyz = points[..., :3]

        def pool_one(pxyz, pfeat, pobj, rois):
            inside = jax.vmap(
                lambda r: _points_in_boxes(pxyz, r[None], 0.0)[:, 0]
            )(rois)                                    # (R, N)
            # deterministic static top-K: in-box points first (top_k
            # breaks ties by index); shortfall slots are masked via
            # `has` below (the reference pads by repeating instead)
            _, pidx = jax.lax.top_k(inside.astype(jnp.float32), k)
            sel_xyz = pxyz[pidx]                       # (R, K, 3)
            sel_feat = pfeat[pidx]
            sel_obj = pobj[pidx]
            has = jnp.take_along_axis(inside, pidx, axis=1)
            return sel_xyz, sel_feat, sel_obj, has

        sel_xyz, sel_feat, sel_obj, sel_has = jax.vmap(pool_one)(
            pts_xyz, feat, obj, prop_boxes)

        # canonical transform (reference point_rcnn_bbox_head forward:
        # rotate by -roi yaw around the roi center)
        ctr = prop_boxes[..., :3].at[..., 2].add(prop_boxes[..., 5] / 2)
        local = sel_xyz - ctr[:, :, None, :]
        yaw = prop_boxes[..., 6]
        c = jnp.cos(-yaw)[..., None]
        s = jnp.sin(-yaw)[..., None]
        lx = local[..., 0] * c - local[..., 1] * s
        ly = local[..., 0] * s + local[..., 1] * c
        canon = jnp.stack([lx, ly, local[..., 2]], -1)
        depth = jnp.linalg.norm(sel_xyz, axis=-1, keepdims=True) / \
            cfg.depth_normalizer
        ext = jnp.concatenate(
            [canon, sel_obj[..., None], depth], -1)    # (B, R, K, 5)
        ext = ext * sel_has[..., None]

        b, r = ext.shape[:2]
        x = ext.reshape(b * r, k, 5).astype(self.dtype)
        pf = sel_feat.reshape(b * r, k, -1).astype(self.dtype)
        for i, wdt in enumerate((128, 128)):
            x = nn.relu(nn.Dense(wdt, dtype=self.dtype,
                                 name=f'xyz_up{i}')(x))
        merged = jnp.concatenate([x, pf], axis=-1)
        merged = nn.relu(nn.Dense(256, dtype=self.dtype,
                                  name='merge')(merged))
        cxyz = canon.reshape(b * r, k, 3)
        h_xyz, h = SAModule(128, 0.2, 16, (128, 128, 128),
                            dtype=self.dtype,
                            name='roi_sa0')(cxyz, merged, train)
        h_xyz, h = SAModule(32, 0.4, 16, (128, 128, 256),
                            dtype=self.dtype,
                            name='roi_sa1')(h_xyz, h, train)
        g = nn.relu(nn.Dense(512, dtype=self.dtype,
                             name='roi_global')(h)).max(axis=1)

        rc = mlp_head(g, (256, 256), 1, 'rcnn_cls').reshape(b, r)
        rr = mlp_head(g, (256, 256), 7, 'rcnn_reg').reshape(b, r, 7)

        return dict(xyz=xyz, cls_pred=cls_pred, reg_pred=reg_pred,
                    proposals=prop_boxes, prop_scores=prop_scores,
                    prop_labels=prop_labels, prop_mask=prop_mask,
                    rcnn_cls=rc, rcnn_reg=rr)


def point_rcnn_loss(outputs, batch, cfg, rng=None):
    """RPN focal + smooth-L1 (point_rpn_head.py:127-171) and RCNN
    binary-CE + smooth-L1 refinement (point_rcnn_bbox_head.py:242-346,
    corner loss folded into the reg term via yaw-aware encode)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    xyz = outputs['xyz']
    gt_boxes = batch['gt_boxes']          # bottom-center z
    gt_labels = batch['gt_labels']
    gt_mask = batch['gt_mask']
    b, n = xyz.shape[:2]

    def one(xyz_i, gtb, gtl, gtm):
        inside = _points_in_boxes(xyz_i, gtb) & gtm[None]
        assign = jnp.argmax(
            inside.astype(jnp.int32) +
            jnp.arange(gtb.shape[0])[None, ::-1] * 0, axis=1)
        pos = inside.any(axis=1)
        ring = _points_in_boxes(xyz_i, gtb, cfg.enlarge_width) & gtm[None]
        negm = ~ring.any(axis=1)
        agt = gtb[assign]
        agt_g = agt.at[:, 2].add(agt[:, 5] / 2)
        albl = gtl[assign]
        tgt = point_coder_encode(agt_g, xyz_i, albl, cfg.mean_sizes)
        return tgt, albl, pos, negm

    tgt, albl, pos, negm = jax.vmap(one)(xyz, gt_boxes, gt_labels,
                                         gt_mask)
    num_pos = jnp.maximum(pos.sum(), 1).astype(jnp.float32)
    # semantic focal loss: assigned class on positives, background
    # (label == C) on clear negatives; ring ignored via weights
    sem_labels = jnp.where(pos, albl, cfg.num_classes)
    wts = (pos | negm).astype(jnp.float32)
    loss_sem = sigmoid_focal_loss(
        outputs['cls_pred'].astype(jnp.float32), sem_labels,
        weights=wts, alpha=0.25, gamma=2.0, avg_factor=num_pos)
    loss_bbox = smooth_l1_loss(
        outputs['reg_pred'].astype(jnp.float32), tgt,
        weights=pos[..., None].astype(jnp.float32), beta=1.0 / 9.0,
        avg_factor=num_pos)

    # ---- RCNN targets ----------------------------------------------
    props = outputs['proposals']
    pmask = outputs['prop_mask']

    def roi_tgt(rois, rmask, gtb, gtl, gtm):
        iou = rotated_iou_3d(rois, gtb)
        iou = jnp.where(gtm[None], iou, 0.0)
        best = iou.max(axis=1)
        arg = iou.argmax(axis=1)
        best = jnp.where(rmask, best, 0.0)
        cls_t = (best > cfg.cls_pos_thr).astype(jnp.float32)
        cls_w = ((best > cfg.cls_pos_thr) |
                 (best < cfg.cls_neg_thr)) & rmask
        regp = (best >= cfg.reg_pos_thr) & rmask
        agt = gtb[arg]
        # yaw-flip the target into the half circle nearest the roi
        # (reference _get_target_single's canonical yaw handling)
        dy_ = agt[:, 6] - rois[:, 6]
        dy_ = jnp.arctan2(jnp.sin(dy_), jnp.cos(dy_))
        flip = jnp.abs(dy_) > jnp.pi / 2
        ny = jnp.where(flip, agt[:, 6] + jnp.pi, agt[:, 6])
        agt = agt.at[:, 6].set(ny)
        enc = delta_xyzwlhr_encode(rois, agt)
        return cls_t, cls_w.astype(jnp.float32), \
            regp.astype(jnp.float32), enc

    cls_t, cls_w, regp, enc = jax.vmap(roi_tgt)(
        props, pmask, gt_boxes, gt_labels, gt_mask)
    rc = outputs['rcnn_cls'].astype(jnp.float32)
    ce = jnp.maximum(rc, 0) - rc * cls_t + jnp.log1p(jnp.exp(-jnp.abs(rc)))
    loss_rcnn_cls = (ce * cls_w).sum() / jnp.maximum(cls_w.sum(), 1.0)
    loss_rcnn_reg = smooth_l1_loss(
        outputs['rcnn_reg'].astype(jnp.float32), enc,
        weights=regp[..., None], beta=1.0,
        avg_factor=jnp.maximum(regp.sum(), 1.0))

    losses = dict(loss_rpn_cls=loss_sem, loss_rpn_bbox=loss_bbox,
                  loss_rcnn_cls=loss_rcnn_cls,
                  loss_rcnn_reg=loss_rcnn_reg)
    return sum(losses.values()), losses


def point_rcnn_predict(outputs, cfg):
    """Decode refined boxes + rotated NMS -> static (max_num,) slots."""
    props = outputs['proposals']
    refined = jax.vmap(delta_xyzwlhr_decode)(
        props, outputs['rcnn_reg'].astype(jnp.float32))
    score = jax.nn.sigmoid(outputs['rcnn_cls'].astype(jnp.float32))
    score = jnp.where(outputs['prop_mask'], score, 0.0)
    labels = outputs['prop_labels']

    def one(bx, sc, lb):
        valid = sc > cfg.score_thr
        keep = nms_bev(bx[:, [0, 1, 3, 4, 6]],
                       jnp.where(valid, sc, -jnp.inf), cfg.rcnn_nms_thr)
        ksc = jnp.where(keep & valid, sc, -jnp.inf)
        out_sc, oi = jax.lax.top_k(ksc, cfg.max_num)
        m = jnp.isfinite(out_sc)
        return (jnp.where(m[:, None], bx[oi], 0.0),
                jnp.where(m, out_sc, 0.0),
                jnp.where(m, lb[oi], -1), m)

    boxes3d, scores, labels, mask = jax.vmap(one)(refined, score, labels)
    return dict(boxes3d=boxes3d, scores=scores, labels=labels, mask=mask)
