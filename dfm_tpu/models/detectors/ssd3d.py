"""3DSSD single-stage point-based detector (flax, static shapes).

Equivalent of the reference's `SSD3DNet` + `SSD3DHead`
(mmdet3d/models/detectors/ssd3dnet.py:1-26,
mmdet3d/models/dense_heads/ssd_3d_head.py:16-557,
configs/_base_/models/3dssd.py):

  points -> PointNet2SAMSG (fusion sampling: D-FPS / FS / F-FPS+D-FPS)
  -> candidate generation (vote offsets on the F-FPS half, clipped to
  vote_xyz_range) -> multi-radius vote aggregation SA -> shared MLP ->
  cls (per-class centerness-weighted scores) + reg (center offset,
  half-dims, direction bins).

Losses (reference ssd_3d_head.py:120-220): sigmoid-CE centerness,
smooth-L1 center / size / corner, CE dir class + smooth-L1 normalized
dir residual, smooth-L1 vote. Targets use the anchor-free coder
(core/bbox/coders/anchor_free_bbox_coder.py:24-87): center =
gravity center, size = dims / 2, yaw binned into num_dir_bins.

TPU-first: all assignment is a static (P, G) points-in-box matrix
(no dynamic per-sample box lists), losses are masked sums with
pos/neg-count normalizers, decode + rotated NMS have fixed shapes.
"""

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.boxes import corners_lidar, points_in_rotated_boxes_bev
from ...core.nms import box3d_multiclass_nms
from ..backbones.pointnet2_msg import PointNet2SAMSG, SAModuleMSG

__all__ = ['SSD3DConfig', 'SSD3DNet', 'ssd3d_loss', 'ssd3d_predict']


@dataclasses.dataclass(frozen=True)
class SSD3DConfig:
    """Static hyperparameters (reference configs/_base_/models/3dssd.py
    + configs/3dssd/3dssd_4x4_kitti-3d-car.py)."""
    num_classes: int = 1
    num_dir_bins: int = 12
    num_candidates: int = 256
    vote_xyz_range: Tuple[float, float, float] = (3.0, 3.0, 2.0)
    # backbone (reference PointNet2SAMSG args; fusion sampling)
    sa_num_points: Tuple[Tuple[int, ...], ...] = ((4096,), (512,),
                                                  (256, 256))
    sa_radii: Tuple[Tuple[float, ...], ...] = (
        (0.2, 0.4, 0.8), (0.4, 0.8, 1.6), (1.6, 3.2, 4.8))
    sa_num_samples: Tuple[Tuple[int, ...], ...] = (
        (32, 32, 64), (32, 32, 64), (32, 32, 32))
    sa_channels: Tuple[Tuple[Tuple[int, ...], ...], ...] = (
        ((16, 16, 32), (16, 16, 32), (32, 32, 64)),
        ((64, 64, 128), (64, 64, 128), (64, 96, 128)),
        ((128, 128, 256), (128, 192, 256), (128, 256, 256)))
    sa_aggregation: Tuple[int, ...] = (64, 128, 256)
    sa_fps_mods: Tuple[Tuple[str, ...], ...] = (
        ('D-FPS',), ('FS',), ('F-FPS', 'D-FPS'))
    sa_fps_ranges: Tuple[Tuple[int, ...], ...] = ((-1,), (-1,),
                                                  (512, -1))
    agg_radii: Tuple[float, ...] = (4.8, 6.4)
    agg_ks: Tuple[int, ...] = (16, 32)
    agg_mlps: Tuple[Tuple[int, ...], ...] = ((256, 256, 256, 512),
                                             (256, 256, 512, 1024))
    shared_channels: Tuple[int, ...] = (512, 128)
    # train (reference 3dssd config train_cfg)
    pos_distance_thr: float = 10.0
    expand_dims_length: float = 0.05
    corner_loss_weight: float = 1.0
    # data
    point_cloud_range: Tuple[float, ...] = (0, -40, -5, 70, 40, 3)
    max_gt: int = 32
    # test
    nms_pre: int = 256
    score_thr: float = 0.05
    nms_thr: float = 0.1
    max_num: int = 64


class SSD3DNet(nn.Module):
    """Forward producing candidate/seed geometry + head predictions;
    loss / decode live in `ssd3d_loss` / `ssd3d_predict`."""
    cfg: SSD3DConfig = dataclasses.field(default_factory=SSD3DConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points (B, N, 3+C) -> dict of predictions."""
        cfg = self.cfg
        feat = PointNet2SAMSG(
            num_points=cfg.sa_num_points, radii=cfg.sa_radii,
            num_samples=cfg.sa_num_samples, sa_channels=cfg.sa_channels,
            aggregation_channels=cfg.sa_aggregation,
            fps_mods=cfg.sa_fps_mods, fps_ranges=cfg.sa_fps_ranges,
            dtype=self.dtype, name='backbone')(points, train)
        seed_xyz = feat['sa_xyz'][-1]           # (B, 512, 3)
        seed_f = feat['sa_features'][-1]        # (B, 512, 256)
        nc = cfg.num_candidates

        # candidate generation on the F-FPS half (reference VoteModule
        # with with_res_feat=False: offsets only, clipped per axis)
        cand_seed_xyz = seed_xyz[:, :nc]
        cand_seed_f = seed_f[:, :nc]
        v = cand_seed_f.astype(self.dtype)
        v = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, dtype=self.dtype,
                                 name='vote_bn')(
            nn.Dense(128, dtype=self.dtype, name='vote_mlp')(v)))
        offset = nn.Dense(3, dtype=self.dtype,
                          name='vote_out')(v).astype(jnp.float32)
        limit = jnp.asarray(cfg.vote_xyz_range, jnp.float32)
        offset = jnp.clip(offset, -limit, limit)
        candidates = cand_seed_xyz + offset       # (B, nc, 3)

        # vote aggregation: group the full seed set around candidates
        agg = SAModuleMSG(
            npoints=(nc,), radii=cfg.agg_radii, ks=cfg.agg_ks,
            mlps=cfg.agg_mlps, dilated=False, aggregation=None,
            dtype=self.dtype, name='vote_aggregation')
        # group the ORIGINAL seed set around the vote-shifted candidate
        # centers (reference vote_aggregation target_xyz path)
        _, agg_f, _ = agg(seed_xyz, seed_f, train,
                          target_xyz=candidates)

        x = agg_f.astype(self.dtype)
        for i, ch in enumerate(cfg.shared_channels):
            x = nn.Dense(ch, dtype=self.dtype, name=f'shared{i}')(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, dtype=self.dtype,
                             name=f'shared_bn{i}')(x)
            x = nn.relu(x)
        c = nn.relu(nn.Dense(128, dtype=self.dtype, name='cls0')(x))
        cls_score = nn.Dense(cfg.num_classes, dtype=self.dtype,
                             name='cls_out')(c).astype(jnp.float32)
        r = nn.relu(nn.Dense(128, dtype=self.dtype, name='reg0')(x))
        reg = nn.Dense(3 + 3 + cfg.num_dir_bins * 2, dtype=self.dtype,
                       name='reg_out')(r).astype(jnp.float32)

        nd = cfg.num_dir_bins
        return dict(
            cls_score=cls_score,                      # (B, nc, C)
            center_offset=reg[..., :3],
            size=reg[..., 3:6],                       # half-dims
            dir_class=reg[..., 6:6 + nd],
            dir_res_norm=reg[..., 6 + nd:6 + 2 * nd],
            aggregated_points=candidates,
            vote_offset=offset,
            seed_points=cand_seed_xyz)


def _points_in_boxes_3d(pts, boxes):
    """(P, 3), (G, 7) -> (P, G) bool (BEV rotated test + z bounds)."""
    bev = points_in_rotated_boxes_bev(pts[:, :2], boxes)
    z0 = boxes[None, :, 2]
    z1 = z0 + boxes[None, :, 5]
    inz = (pts[:, 2:3] >= z0) & (pts[:, 2:3] <= z1)
    return bev & inz


def _smooth_l1(x, beta=1.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def ssd3d_loss(outputs, batch, cfg: SSD3DConfig):
    """Reference ssd_3d_head.py:120-220 semantics with static shapes.

    batch: points (B, N, 3+C), gt_boxes (B, G, 7) LiDAR frame
    (bottom-center origin), gt_labels (B, G), gt_mask (B, G).
    """
    gt_boxes = batch['gt_boxes'].astype(jnp.float32)
    gt_labels = batch['gt_labels']
    gt_mask = batch['gt_mask']
    agg = outputs['aggregated_points']             # (B, P, 3)
    nd = cfg.num_dir_bins
    bin_w = 2 * np.pi / nd

    def single(agg_i, seed_i, gt_b, gt_l, gt_m):
        # encode targets (anchor-free coder)
        gt_center = jnp.concatenate(
            [gt_b[:, :2], gt_b[:, 2:3] + gt_b[:, 5:6] / 2], -1)
        gt_half = gt_b[:, 3:6] / 2
        yaw = gt_b[:, 6] % (2 * np.pi)
        dir_cls_t = jnp.floor(yaw / bin_w).astype(jnp.int32) % nd
        dir_res_t = (yaw - (dir_cls_t.astype(jnp.float32) + 0.5) *
                     bin_w + bin_w / 2) / bin_w  # normalized in [0,1)
        dir_res_t = dir_res_t - 0.5              # centered residual

        pm = _points_in_boxes_3d(agg_i, gt_b) & gt_m[None, :]
        inside = pm.any(-1)
        # nearest-center tiebreak for points inside multiple boxes
        d2 = jnp.sum((agg_i[:, None] - gt_center[None]) ** 2, -1)
        d2 = jnp.where(pm, d2, jnp.inf)
        assign = jnp.argmin(jnp.where(gt_m[None, :], d2, jnp.inf), -1)

        ct = gt_center[assign]
        half = gt_half[assign]
        top = ct.at[:, 2].add(half[:, 2])
        dist_ok = jnp.linalg.norm(agg_i - top, axis=-1) < \
            cfg.pos_distance_thr
        pos = inside & dist_ok & gt_m.any()
        neg = ~inside | ~gt_m.any()

        # centerness in the assigned box's canonical frame
        rel = agg_i - ct
        cos, sin = jnp.cos(-gt_b[assign, 6]), jnp.sin(-gt_b[assign, 6])
        cx = rel[:, 0] * cos - rel[:, 1] * sin
        cy = rel[:, 0] * sin + rel[:, 1] * cos
        canon = jnp.stack([cx, cy, rel[:, 2]], -1)
        d_lo = jnp.maximum(half + canon, 0)
        d_hi = jnp.maximum(half - canon, 0)
        ratio = jnp.minimum(d_lo, d_hi) / jnp.maximum(
            jnp.maximum(d_lo, d_hi), 1e-6)
        # detached target (reference centerness_targets.detach());
        # without it cbrt'(0)=inf back-propagates NaN into the votes
        prod = jax.lax.stop_gradient(jnp.clip(jnp.prod(ratio, -1), 0))
        centerness = jnp.clip(jnp.cbrt(prod), 0, 1)

        # vote targets on the candidate seeds: enlarged boxes
        e = cfg.expand_dims_length
        big = gt_b.at[:, 3:6].add(2 * e).at[:, 2].add(-e)
        vm = _points_in_boxes_3d(seed_i, big) & gt_m[None, :]
        v_inside = vm.any(-1)
        vd2 = jnp.sum((seed_i[:, None] - gt_center[None]) ** 2, -1)
        vd2 = jnp.where(vm, vd2, jnp.inf)
        v_assign = jnp.argmin(jnp.where(gt_m[None, :], vd2, jnp.inf), -1)
        vote_t = gt_center[v_assign] - seed_i

        return (ct, half, dir_cls_t[assign], dir_res_t[assign],
                gt_l[assign], corners_lidar(gt_b)[assign], centerness,
                pos, neg, vote_t, v_inside)

    (ct, half_t, dcls_t, dres_t, lbl_t, corner_t, ctr_t, pos, neg,
     vote_t, vote_m) = jax.vmap(single)(
        jax.lax.stop_gradient(agg),
        jax.lax.stop_gradient(outputs['seed_points']),
        gt_boxes, gt_labels, gt_mask)

    npos = jnp.maximum(pos.sum(), 1.0)
    w_box = pos.astype(jnp.float32) / npos
    w_ctr = (pos | neg).astype(jnp.float32)
    w_ctr = w_ctr / jnp.maximum(w_ctr.sum(), 1e-6)

    # centerness loss: per-class sigmoid CE against centerness one-hot
    onehot = jax.nn.one_hot(lbl_t, cfg.num_classes) * ctr_t[..., None]
    logits = outputs['cls_score']
    ce = jnp.maximum(logits, 0) - logits * onehot + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss_centerness = (ce.sum(-1) * w_ctr).sum()

    center_t = ct - agg
    loss_center = (_smooth_l1(outputs['center_offset'] - center_t)
                   .sum(-1) * w_box).sum()
    loss_size = (_smooth_l1(outputs['size'] - half_t).sum(-1) *
                 w_box).sum()

    dlp = jax.nn.log_softmax(outputs['dir_class'], -1)
    loss_dir_cls = (-jnp.take_along_axis(
        dlp, dcls_t[..., None], -1)[..., 0] * w_box).sum()
    dres_p = jnp.take_along_axis(outputs['dir_res_norm'],
                                 dcls_t[..., None], -1)[..., 0]
    loss_dir_res = (_smooth_l1(dres_p - dres_t) * w_box).sum()

    # corner loss: decode with the TARGET dir class (reference
    # one_hot_dir_class_targets decode)
    yaw_p = (dcls_t.astype(jnp.float32) + 0.5) * bin_w + \
        jnp.take_along_axis(outputs['dir_res_norm'],
                            dcls_t[..., None], -1)[..., 0] * bin_w - \
        bin_w / 2
    dims_p = jnp.clip(outputs['size'] * 2, 0.1)
    ctr_p = agg + outputs['center_offset']
    bottom = jnp.concatenate(
        [ctr_p[..., :2], ctr_p[..., 2:3] - dims_p[..., 2:3] / 2], -1)
    boxes_p = jnp.concatenate([bottom, dims_p, yaw_p[..., None]], -1)
    loss_corner = (_smooth_l1(corners_lidar(boxes_p) - corner_t)
                   .sum((-1, -2)) * w_box).sum() * cfg.corner_loss_weight

    w_vote = vote_m.astype(jnp.float32)
    w_vote = w_vote / jnp.maximum(w_vote.sum(), 1e-6)
    loss_vote = (_smooth_l1(outputs['vote_offset'] - vote_t).sum(-1) *
                 w_vote).sum()

    losses = dict(loss_centerness=loss_centerness,
                  loss_center=loss_center, loss_size=loss_size,
                  loss_dir_cls=loss_dir_cls, loss_dir_res=loss_dir_res,
                  loss_corner=loss_corner, loss_vote=loss_vote)
    return sum(losses.values()), losses


def ssd3d_predict(outputs, cfg: SSD3DConfig):
    """Decode + multi-class rotated NMS (reference VoteHead.get_bboxes
    with the anchor-free coder decode)."""
    nd = cfg.num_dir_bins
    bin_w = 2 * np.pi / nd
    scores = jax.nn.sigmoid(outputs['cls_score'])     # (B, P, C)
    dcls = jnp.argmax(outputs['dir_class'], -1)
    dres = jnp.take_along_axis(outputs['dir_res_norm'],
                               dcls[..., None], -1)[..., 0] * bin_w
    yaw = (dcls.astype(jnp.float32) + 0.5) * bin_w + dres - bin_w / 2
    dims = jnp.clip(outputs['size'] * 2, 0.1)
    ctr = outputs['aggregated_points'] + outputs['center_offset']
    bottom = jnp.concatenate(
        [ctr[..., :2], ctr[..., 2:3] - dims[..., 2:3] / 2], -1)
    boxes = jnp.concatenate([bottom, dims, yaw[..., None]], -1)

    def single(boxes_i, scores_i):
        bev = boxes_i[:, [0, 1, 3, 4, 6]]
        return box3d_multiclass_nms(
            boxes_i, bev, scores_i, cfg.score_thr, cfg.nms_thr,
            cfg.max_num)

    det = jax.vmap(single)(boxes, scores)
    return dict(boxes_3d=det['boxes3d'], scores_3d=det['scores'],
                labels_3d=det['labels'], mask=det['mask'])
