"""Detection losses (pure JAX).

Replaces the reference's mmcv CUDA `sigmoid_focal_loss` and torch losses
with plain vectorized math; everything takes explicit weights and
avg_factor so batched, masked (static-shape) training works.
"""

import jax
import jax.numpy as jnp

from .iou import rotated_iou_3d

__all__ = ['sigmoid_focal_loss', 'smooth_l1_loss', 'softmax_cross_entropy',
           'binary_cross_entropy', 'iou3d_loss', 'weighted_l2_loss',
           'giou_loss_2d', 'paconv_regularization_loss']


def sigmoid_focal_loss(logits, labels, weights=None, alpha=0.25, gamma=2.0,
                       avg_factor=None):
    """Multi-class sigmoid focal loss with integer labels.

    Args:
        logits: (..., C).
        labels: (...,) int in [0, C]; label == C means background.
        weights: (...,) optional per-element weights.
    """
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = jnp.where(onehot > 0, p, 1 - p)
    alpha_t = jnp.where(onehot > 0, alpha, 1 - alpha)
    ce = -jnp.where(
        onehot > 0, jax.nn.log_sigmoid(logits), jax.nn.log_sigmoid(-logits))
    loss = alpha_t * (1 - pt)**gamma * ce
    loss = jnp.sum(loss, axis=-1)
    if weights is not None:
        loss = loss * weights
    total = jnp.sum(loss)
    if avg_factor is not None:
        total = total / avg_factor
    return total


def smooth_l1_loss(pred, target, weights=None, beta=1.0 / 9.0,
                   avg_factor=None):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
    if weights is not None:
        loss = loss * weights
    total = jnp.sum(loss)
    if avg_factor is not None:
        total = total / avg_factor
    return total


def softmax_cross_entropy(logits, labels, weights=None, avg_factor=None):
    """CE with integer labels over the last axis."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if weights is not None:
        nll = nll * weights
    total = jnp.sum(nll)
    if avg_factor is not None:
        total = total / avg_factor
    return total


def binary_cross_entropy(logits, targets, weights=None, avg_factor=None):
    loss = jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weights is not None:
        loss = loss * weights
    total = jnp.sum(loss)
    if avg_factor is not None:
        total = total / avg_factor
    return total


def iou3d_loss(pred_boxes, target_boxes, weights=None, avg_factor=None):
    """1 - rotated 3D IoU, differentiable (reference losses/iou3d_loss.py:36
    over mmcv `diff_iou_rotated_3d`). Elementwise over matched pairs."""
    iou = jax.vmap(
        lambda p, t: rotated_iou_3d(p[None], t[None])[0, 0])(
            pred_boxes, target_boxes)
    loss = 1.0 - iou
    if weights is not None:
        # hard select, not multiply: the rotated clip can emit
        # inf/nan on degenerate (identical / zero-area) pairs and
        # 0 * inf would poison the sum
        loss = jnp.where(weights > 0, loss * weights, 0.0)
    total = jnp.sum(loss)
    if avg_factor is not None:
        total = total / avg_factor
    return total


def weighted_l2_loss(pred, target, weights=None, sigma=None):
    """WeightedL2WithSigmaLoss (reference detectors/imitation_utils.py:97)
    without the (unused-by-default) sigma branch: 0.5 * (d^2)."""
    diff = pred - target
    loss = 0.5 * diff * diff
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def giou_loss_2d(pred, target, weights=None, avg_factor=None):
    """GIoU loss over (..., 4) xyxy boxes (2D aux head)."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    ap = jnp.maximum(pred[..., 2] - pred[..., 0], 0) * \
        jnp.maximum(pred[..., 3] - pred[..., 1], 0)
    at = jnp.maximum(target[..., 2] - target[..., 0], 0) * \
        jnp.maximum(target[..., 3] - target[..., 1], 0)
    union = ap + at - inter
    iou = inter / jnp.maximum(union, 1e-7)
    # smallest enclosing box
    elt = jnp.minimum(pred[..., :2], target[..., :2])
    erb = jnp.maximum(pred[..., 2:], target[..., 2:])
    ewh = jnp.maximum(erb - elt, 0.0)
    enclose = jnp.maximum(ewh[..., 0] * ewh[..., 1], 1e-7)
    giou = iou - (enclose - union) / enclose
    loss = 1.0 - giou
    if weights is not None:
        loss = loss * weights
    total = jnp.sum(loss)
    if avg_factor is not None:
        total = total / avg_factor
    return total


def paconv_regularization_loss(weight_banks, num_kernels,
                               reduction='mean', loss_weight=1.0):
    """Correlation regularizer over PAConv weight banks (reference
    losses/paconv_regularization_loss.py:10-69): squared upper-triangle
    cosine similarity between the `num_kernels` kernels of each bank.

    Args:
        weight_banks: list of (C_in, num_kernels * C_out) arrays.
        num_kernels: kernels per bank (static).
        reduction: 'none' | 'sum' | 'mean' over the banks.
    """
    def corr(bank):
        cin, kc = bank.shape
        k = jnp.reshape(bank, (cin, num_kernels, kc // num_kernels))
        flat = jnp.transpose(k, (1, 0, 2)).reshape(num_kernels, -1)
        inner = flat @ flat.T
        norms = jnp.sqrt(jnp.sum(flat * flat, axis=-1, keepdims=True))
        cos = inner / jnp.maximum(norms @ norms.T, 1e-12)
        triu = jnp.triu(cos, k=1)
        return jnp.sum(triu * triu)

    losses = jnp.stack([corr(b.astype(jnp.float32))
                        for b in weight_banks])
    if reduction == 'sum':
        losses = losses.sum()
    elif reduction == 'mean':
        losses = losses.mean()
    return loss_weight * losses
