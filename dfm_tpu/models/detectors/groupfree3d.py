"""Group-Free 3D detector (flax, static shapes).

Equivalent of the reference's `GroupFree3DNet` + `GroupFree3DHead`
(mmdet3d/models/detectors/groupfree3dnet.py:1-105,
mmdet3d/models/dense_heads/groupfree3d_head.py:110-994,
configs/_base_/models/groupfree3d.py):

  points -> PointNet2SASSG (4 SA + 2 FP -> 1024 seeds x 288)
  -> KPS sampling (per-seed objectness logits, top-num_proposal seeds
  become queries) -> initial proposal head -> L transformer decoder
  layers (self-attn over queries + cross-attn to all seeds, with
  box-conditioned query positional embeddings and seed-xyz key
  embeddings) -> per-stage prediction heads.

Losses (reference groupfree3d_head.py:394-537): focal sampling
objectness on every seed (targets = per-gt k-closest seeds), and per
stage (proposal + each decoder layer, each weighted 1/num_stages):
focal objectness, smooth-L1 center, CE size class + smooth-L1
normalized size residual, CE semantic; dir terms dropped for the
axis-aligned ScanNet family (bbox coder with_rot=False — same
degenerate num_dir_bins=1 shortcut the reference coder takes).

TPU-first: the decoder is unrolled (static L), attention is
`nn.MultiHeadDotProductAttention` over fixed-size query/seed sets, and
assignment is a static points-in-box + argmin matrix per sample.
"""

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.boxes import points_in_rotated_boxes_bev
from ..backbones.pointnet2 import PointNet2SASSG

__all__ = ['GroupFree3DConfig', 'GroupFree3DNet', 'groupfree3d_loss',
           'groupfree3d_predict']


@dataclasses.dataclass(frozen=True)
class GroupFree3DConfig:
    """ScanNet-18-class defaults (reference
    configs/_base_/models/groupfree3d.py + scannet dataset meta)."""
    num_classes: int = 18
    num_proposal: int = 256
    num_decoder_layers: int = 6
    embed_dims: int = 288
    num_heads: int = 8
    ffn_channels: int = 2048
    # per-class mean sizes (size-class residual coding)
    mean_sizes: Tuple[Tuple[float, float, float], ...] = tuple(
        (0.8, 0.8, 0.9) for _ in range(18))
    seed_points_obj_topk: int = 4
    # backbone
    sa_points: Tuple[int, ...] = (2048, 1024, 512, 256)
    sa_radii: Tuple[float, ...] = (0.2, 0.4, 0.8, 1.2)
    sa_ks: Tuple[int, ...] = (64, 32, 16, 16)
    sa_mlps: Tuple[Tuple[int, ...], ...] = (
        (64, 64, 128), (128, 128, 256), (128, 128, 256),
        (128, 128, 256))
    fp_channels: Tuple[Tuple[int, ...], ...] = ((256, 256), (256, 288))
    # loss weights (reference config)
    sampling_obj_weight: float = 8.0
    center_weight: float = 10.0
    size_res_weight: float = 10.0
    max_gt: int = 32
    # test
    score_thr: float = 0.0
    max_num: int = 128


class _PredHead(nn.Module):
    """Shared-conv prediction head: cls (objectness + sem) and reg
    (center residual + size class + size residual per class)."""
    cfg: GroupFree3DConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, base_xyz, train: bool = False):
        cfg = self.cfg
        c = cfg.num_classes
        for i, ch in enumerate((cfg.embed_dims, cfg.embed_dims)):
            x = nn.Dense(ch, dtype=self.dtype, name=f'shared{i}')(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, dtype=self.dtype,
                             name=f'shared_bn{i}')(x)
            x = nn.relu(x)
        cls = nn.Dense(1 + c, dtype=self.dtype,
                       name='cls_out')(x).astype(jnp.float32)
        reg = nn.Dense(3 + c + 3 * c, dtype=self.dtype,
                       name='reg_out')(x).astype(jnp.float32)
        ctr_res = reg[..., :3]
        return dict(obj_scores=cls[..., :1],
                    sem_scores=cls[..., 1:],
                    center_residual=ctr_res,
                    center=jax.lax.stop_gradient(base_xyz) + ctr_res,
                    size_class=reg[..., 3:3 + c],
                    size_res_norm=reg[..., 3 + c:].reshape(
                        reg.shape[:-1] + (c, 3)))


class _DecoderLayer(nn.Module):
    """self_attn -> norm -> cross_attn -> norm -> ffn -> norm with
    additive positional embeddings (reference GroupFree3DMHA +
    BaseTransformerLayer operation_order)."""
    cfg: GroupFree3DConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, query_pos, key_pos,
                 train: bool = False):
        cfg = self.cfg
        q = query + query_pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, qkv_features=cfg.embed_dims,
            dtype=self.dtype, name='self_attn')
        x = query + attn(q, q)
        x = nn.LayerNorm(dtype=self.dtype, name='norm0')(x)
        attn2 = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, qkv_features=cfg.embed_dims,
            dtype=self.dtype, name='cross_attn')
        x = x + attn2(x + query_pos, key + key_pos)
        x = nn.LayerNorm(dtype=self.dtype, name='norm1')(x)
        y = nn.Dense(cfg.ffn_channels, dtype=self.dtype, name='ffn0')(x)
        y = nn.Dense(cfg.embed_dims, dtype=self.dtype,
                     name='ffn1')(nn.relu(y))
        return nn.LayerNorm(dtype=self.dtype, name='norm2')(x + y)


class GroupFree3DNet(nn.Module):
    cfg: GroupFree3DConfig = dataclasses.field(
        default_factory=GroupFree3DConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points (B, N, 3+C) -> dict of per-stage predictions."""
        cfg = self.cfg
        seed_xyz, seed_f = PointNet2SASSG(
            sa_points=cfg.sa_points, sa_radii=cfg.sa_radii,
            sa_ks=cfg.sa_ks, sa_mlps=cfg.sa_mlps,
            fp_channels=cfg.fp_channels, dtype=self.dtype,
            name='backbone')(points.astype(self.dtype), train)

        # KPS sampling: per-seed objectness -> top-k seeds as queries
        s = seed_f.astype(self.dtype)
        s = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, dtype=self.dtype,
                                 name='points_obj_bn')(
            nn.Dense(cfg.embed_dims, dtype=self.dtype,
                     name='points_obj_mlp')(s)))
        obj_logits = nn.Dense(1, dtype=self.dtype, name='points_obj_cls')(
            s)[..., 0].astype(jnp.float32)          # (B, S)
        _, cand_idx = jax.lax.top_k(obj_logits, cfg.num_proposal)
        cand_xyz = jnp.take_along_axis(seed_xyz, cand_idx[..., None], 1)
        cand_f = jnp.take_along_axis(seed_f, cand_idx[..., None], 1)

        stages = []
        head0 = _PredHead(cfg, dtype=self.dtype, name='head_proposal')
        pred = head0(cand_f.astype(self.dtype), cand_xyz, train)
        stages.append(pred)

        query = nn.Dense(cfg.embed_dims, dtype=self.dtype,
                         name='decoder_query_proj')(
            cand_f.astype(self.dtype))
        key = nn.Dense(cfg.embed_dims, dtype=self.dtype,
                       name='decoder_key_proj')(seed_f.astype(self.dtype))
        key_pos_base = seed_xyz.astype(self.dtype)

        for i in range(cfg.num_decoder_layers):
            # query positional embedding conditioned on the current
            # box estimate (center + decoded size)
            mean = jnp.asarray(cfg.mean_sizes, jnp.float32)
            scls = jnp.argmax(pred['size_class'], -1)
            sres = jnp.take_along_axis(
                pred['size_res_norm'],
                scls[..., None, None].repeat(3, -1), 2)[:, :, 0]
            dims = jnp.maximum(mean[scls] * (1 + sres), 0.1)
            base_box = jax.lax.stop_gradient(jnp.concatenate(
                [pred['center'], dims], -1)).astype(self.dtype)
            qp = nn.Dense(cfg.embed_dims, dtype=self.dtype,
                          name=f'self_posembed{i}')(base_box)
            kp = nn.Dense(cfg.embed_dims, dtype=self.dtype,
                          name=f'cross_posembed{i}')(key_pos_base)
            query = _DecoderLayer(cfg, dtype=self.dtype,
                                  name=f'decoder{i}')(
                query, key, qp, kp, train)
            pred = _PredHead(cfg, dtype=self.dtype,
                             name=f'head_s{i}')(query, cand_xyz, train)
            stages.append(pred)

        return dict(seeds_obj_cls_logits=obj_logits,
                    seed_points=seed_xyz,
                    query_points_xyz=cand_xyz,
                    candidate_idx=cand_idx,
                    stages=stages)


def _sigmoid_focal(logits, targets, alpha=0.25, gamma=2.0):
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    pt = p * targets + (1 - p) * (1 - targets)
    a = alpha * targets + (1 - alpha) * (1 - targets)
    return a * (1 - pt) ** gamma * ce


def _smooth_l1(x, beta=1.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def groupfree3d_loss(outputs, batch, cfg: GroupFree3DConfig):
    """Reference groupfree3d_head.py:394-537 semantics (axis-aligned
    family). batch: points, gt_boxes (B, G, 7) bottom-center, gt_labels,
    gt_mask."""
    gt = batch['gt_boxes'].astype(jnp.float32)
    gt_labels = batch['gt_labels']
    gt_mask = batch['gt_mask']
    seeds = jax.lax.stop_gradient(outputs['seed_points'])
    cand_idx = outputs['candidate_idx']
    mean = jnp.asarray(cfg.mean_sizes, jnp.float32)

    def single(seeds_i, cidx, gt_b, gt_l, gt_m):
        gt_center = jnp.concatenate(
            [gt_b[:, :2], gt_b[:, 2:3] + gt_b[:, 5:6] / 2], -1)
        bev = points_in_rotated_boxes_bev(seeds_i[:, :2], gt_b)
        inz = (seeds_i[:, 2:3] >= gt_b[None, :, 2]) & \
            (seeds_i[:, 2:3] <= gt_b[None, :, 2] + gt_b[None, :, 5])
        pm = bev & inz & gt_m[None, :]                   # (S, G)
        obj = pm.any(-1)
        d2 = jnp.sum((seeds_i[:, None] - gt_center[None]) ** 2, -1)
        assign_seed = jnp.argmin(jnp.where(pm, d2, jnp.inf), -1)
        assign_seed = jnp.where(obj, assign_seed, 0)

        # sampling targets: per-gt k-closest seeds (normalized dist)
        norm_d = jnp.sqrt(jnp.sum(
            ((seeds_i[:, None] - gt_center[None]) /
             (gt_b[None, :, 3:6] + 1e-6)) ** 2, -1) + 1e-6)
        # only seeds assigned to that gt compete (reference one-hot mask)
        onehot = jax.nn.one_hot(assign_seed, gt_b.shape[0]) * \
            obj[:, None]
        comp = jnp.where(onehot > 0, norm_d, 100.0)       # (S, G)
        k = min(cfg.seed_points_obj_topk, seeds_i.shape[0])
        _, topk_idx = jax.lax.top_k(-comp.T, k)           # (G, k)
        samp = jnp.zeros((seeds_i.shape[0],), jnp.float32)
        samp = samp.at[topk_idx.reshape(-1)].max(
            jnp.repeat(gt_m.astype(jnp.float32), k))
        samp = samp * obj.astype(jnp.float32)

        # candidate-level targets
        cobj = jnp.take_along_axis(obj, cidx, 0)
        cassign = jnp.take_along_axis(assign_seed, cidx, 0)
        ct = gt_center[cassign]
        lbl = gt_l[cassign]
        dims = gt_b[cassign, 3:6]
        size_cls_t = lbl                                   # per-class size
        size_res_t = (dims - mean[lbl]) / (mean[lbl] + 1e-6)
        return (samp, obj, cobj, cassign, ct, lbl, size_cls_t,
                size_res_t)

    (samp_t, obj_t, cobj_t, _, ct, lbl_t, scls_t, sres_t) = jax.vmap(
        single)(seeds, cand_idx, gt, gt_labels, gt_mask)

    b = gt.shape[0]
    losses = {}
    losses['loss_sampling_obj'] = _sigmoid_focal(
        outputs['seeds_obj_cls_logits'], samp_t).sum() / b * \
        cfg.sampling_obj_weight

    w_box = cobj_t.astype(jnp.float32)
    w_box = w_box / jnp.maximum(w_box.sum(), 1e-6)
    stages = outputs['stages']
    ns = len(stages)
    for si, st in enumerate(stages):
        tag = 'proposal' if si == 0 else f's{si - 1}'
        lobj = _sigmoid_focal(st['obj_scores'][..., 0],
                              cobj_t.astype(jnp.float32)).sum() / b / ns
        lctr = (_smooth_l1(st['center'] - ct).sum(-1) * w_box).sum() \
            * cfg.center_weight / ns
        slp = jax.nn.log_softmax(st['size_class'], -1)
        lscls = (-jnp.take_along_axis(slp, scls_t[..., None],
                                      -1)[..., 0] * w_box).sum() / ns
        sres_p = jnp.take_along_axis(
            st['size_res_norm'],
            scls_t[..., None, None].repeat(3, -1), 2)[:, :, 0]
        lsres = (_smooth_l1(sres_p - sres_t).sum(-1) * w_box).sum() \
            * cfg.size_res_weight / ns
        clp = jax.nn.log_softmax(st['sem_scores'], -1)
        lsem = (-jnp.take_along_axis(clp, lbl_t[..., None],
                                     -1)[..., 0] * w_box).sum() / ns
        losses[f'loss_{tag}_obj'] = lobj
        losses[f'loss_{tag}_center'] = lctr
        losses[f'loss_{tag}_size_cls'] = lscls
        losses[f'loss_{tag}_size_res'] = lsres
        losses[f'loss_{tag}_sem'] = lsem
    return sum(losses.values()), losses


def groupfree3d_predict(outputs, cfg: GroupFree3DConfig):
    """Decode the LAST stage (reference test_cfg
    prediction_stages='last'): axis-aligned boxes + per-class scores."""
    st = outputs['stages'][-1]
    obj = jax.nn.sigmoid(st['obj_scores'][..., 0])
    sem = jax.nn.softmax(st['sem_scores'], -1)
    scores = obj[..., None] * sem                     # (B, P, C)
    mean = jnp.asarray(cfg.mean_sizes, jnp.float32)
    scls = jnp.argmax(st['size_class'], -1)
    sres = jnp.take_along_axis(
        st['size_res_norm'], scls[..., None, None].repeat(3, -1),
        2)[:, :, 0]
    dims = jnp.maximum(mean[scls] * (1 + sres), 0.01)
    ctr = st['center']
    bottom = jnp.concatenate(
        [ctr[..., :2], ctr[..., 2:3] - dims[..., 2:3] / 2], -1)
    boxes = jnp.concatenate(
        [bottom, dims, jnp.zeros_like(dims[..., :1])], -1)
    labels = jnp.argmax(sem, -1)
    best = jnp.take_along_axis(scores, labels[..., None], -1)[..., 0]
    best = jnp.where(best > cfg.score_thr, best, 0.0)
    return dict(boxes_3d=boxes, scores_3d=best, labels_3d=labels)
