"""Detection & occupancy losses.

Replaces:
  * mmcv's CUDA `diff_iou_rotated_3d` → `rotated_iou_3d_loss`
    (reference models/losses/rotated_iou_loss.py:14-91): here the
    differentiable IoU comes from the exact vertex-enumeration kernel
    (ops/box3d_overlap.py), which is differentiable through the vertex
    solve and handles full 9-DoF (the reference truncates to 7-DoF);
  * `AxisAlignedIoULoss` (mmdet3d) for the axis-aligned path;
  * the occupancy scal losses (reference models/losses/occ_loss.py:
    39-141) and the Gaussian kernel offset loss
    (models/losses/gaussian_offset_loss.py:1-35).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.box3d_overlap import _pair_intersection_volume


def _elementwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                     eps: float = 1e-4) -> jnp.ndarray:
    """Exact IoU of matched box pairs: (N, 9) × (N, 9) → (N,)."""
    inter = jax.vmap(lambda a, b: _pair_intersection_volume(a, b, eps))(
        boxes1, boxes2)
    v1 = jnp.prod(jnp.abs(boxes1[:, 3:6]), -1)
    v2 = jnp.prod(jnp.abs(boxes2[:, 3:6]), -1)
    return jnp.clip(inter / jnp.maximum(v1 + v2 - inter, 1e-8), 0.0, 1.0)


def rotated_iou_3d_loss(pred: jnp.ndarray, target: jnp.ndarray,
                        weight=None, avg_factor=None) -> jnp.ndarray:
    """1 - IoU for oriented boxes (7 or 9-DoF; zero-padded to 9)."""
    def pad9(b):
        if b.shape[-1] == 9:
            return b
        pad = jnp.zeros(b.shape[:-1] + (9 - b.shape[-1], ), b.dtype)
        return jnp.concatenate([b, pad], -1)

    loss = 1.0 - _elementwise_iou(pad9(pred), pad9(target))
    if weight is not None:
        loss = loss * jnp.reshape(weight, loss.shape)
    s = jnp.sum(loss)
    if avg_factor is not None:
        s = s / jnp.maximum(avg_factor, 1e-6)
    return s


def axis_aligned_iou_loss(pred: jnp.ndarray, target: jnp.ndarray,
                          weight=None, avg_factor=None) -> jnp.ndarray:
    """1 - IoU for (x1,y1,z1,x2,y2,z2) axis-aligned boxes."""
    lo = jnp.maximum(pred[..., :3], target[..., :3])
    hi = jnp.minimum(pred[..., 3:], target[..., 3:])
    inter = jnp.prod(jnp.clip(hi - lo, 0.0, None), -1)
    v1 = jnp.prod(jnp.clip(pred[..., 3:] - pred[..., :3], 0.0, None), -1)
    v2 = jnp.prod(jnp.clip(target[..., 3:] - target[..., :3], 0.0, None), -1)
    iou = inter / jnp.maximum(v1 + v2 - inter, 1e-8)
    loss = 1.0 - iou
    if weight is not None:
        loss = loss * jnp.reshape(weight, loss.shape)
    s = jnp.sum(loss)
    if avg_factor is not None:
        s = s / jnp.maximum(avg_factor, 1e-6)
    return s


def binary_cross_entropy_with_logits(pred, target, weight=None,
                                     avg_factor=None):
    """mmdet CrossEntropyLoss(use_sigmoid=True) semantics."""
    loss = jnp.clip(pred, 0, None) - pred * target + \
        jnp.log1p(jnp.exp(-jnp.abs(pred)))
    if weight is not None:
        loss = loss * weight
    s = jnp.sum(loss)
    if avg_factor is not None:
        s = s / jnp.maximum(avg_factor, 1.0)
    return s


def gaussian_kernel_loss(offsets: jnp.ndarray, sigma: float = 1.0,
                         mask=None) -> jnp.ndarray:
    """Penalize large preshape offsets with an (inverted) Gaussian
    kernel (reference gaussian_offset_loss.py:1-35)."""
    d2 = jnp.sum(offsets * offsets, -1)
    loss = 1.0 - jnp.exp(-d2 / (2 * sigma ** 2))
    if mask is not None:
        return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(loss)


def geo_scal_loss(pred_logits: jnp.ndarray, gt: jnp.ndarray,
                  empty_label: int, mask=None) -> jnp.ndarray:
    """Geometric scene-class affinity loss (occ, reference
    occ_loss.py:39-88): precision/recall/specificity of the
    occupied-vs-empty split."""
    probs = jax.nn.softmax(pred_logits, -1)
    empty = probs[..., empty_label]
    nonempty = 1.0 - empty
    is_occ = (gt != empty_label) & (gt >= 0)
    if mask is None:
        mask = gt >= 0
    m = mask.astype(probs.dtype)
    occ = is_occ.astype(probs.dtype) * m
    free = (1.0 - is_occ) * m
    eps = 1e-6
    precision = jnp.sum(nonempty * occ) / jnp.maximum(
        jnp.sum(nonempty * m), eps)
    recall = jnp.sum(nonempty * occ) / jnp.maximum(jnp.sum(occ), eps)
    spec = jnp.sum(empty * free) / jnp.maximum(jnp.sum(free), eps)
    return (-jnp.log(jnp.clip(precision, eps, 1.0))
            - jnp.log(jnp.clip(recall, eps, 1.0))
            - jnp.log(jnp.clip(spec, eps, 1.0)))


def sem_scal_loss(pred_logits: jnp.ndarray, gt: jnp.ndarray,
                  mask=None) -> jnp.ndarray:
    """Semantic scene-class affinity loss (reference occ_loss.py:90-141):
    per-class precision/recall/specificity averaged over present
    classes."""
    C = pred_logits.shape[-1]
    probs = jax.nn.softmax(pred_logits, -1)
    if mask is None:
        mask = gt >= 0
    m = mask.astype(probs.dtype)
    eps = 1e-6
    total = jnp.zeros(())
    count = jnp.zeros(())
    for c in range(C):
        p = probs[..., c]
        t = ((gt == c).astype(probs.dtype)) * m
        has = jnp.sum(t) > 0
        precision = jnp.sum(p * t) / jnp.maximum(jnp.sum(p * m), eps)
        recall = jnp.sum(p * t) / jnp.maximum(jnp.sum(t), eps)
        spec = jnp.sum((1 - p) * (m - t)) / jnp.maximum(
            jnp.sum(m - t), eps)
        l = (-jnp.log(jnp.clip(precision, eps, 1.0))
             - jnp.log(jnp.clip(recall, eps, 1.0))
             - jnp.log(jnp.clip(spec, eps, 1.0)))
        total = total + jnp.where(has, l, 0.0)
        count = count + jnp.where(has, 1.0, 0.0)
    return total / jnp.maximum(count, 1.0)
