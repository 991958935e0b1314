"""Losses and match costs for the grounding head, TPU-native.

Replicates the reference's mmdet `FocalLoss` (sigmoid, γ=2, α=0.25),
`BBoxCDLoss` corner-Chamfer bbox loss (reference:
models/losses/chamfer_distance.py:13-285) and the Hungarian match costs
`BinaryFocalLossCost` / `BBox3DL1Cost` / `IoU3DCost` (reference:
models/losses/match_cost.py:49-265) as masked, static-shape functions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures.boxes import bbox_to_corners
from ..ops.box3d_overlap import box3d_iou


def sigmoid_focal_loss(pred: jnp.ndarray, target: jnp.ndarray,
                       weight: jnp.ndarray = None, alpha: float = 0.25,
                       gamma: float = 2.0, avg_factor=None) -> jnp.ndarray:
    """mmdet py_sigmoid focal loss with float (soft) targets."""
    p = jax.nn.sigmoid(pred)
    pt = (1 - p) * target + p * (1 - target)
    focal_weight = (alpha * target + (1 - alpha) * (1 - target)) * pt ** gamma
    # numerically-stable BCE with logits
    bce = jnp.clip(pred, 0, None) - pred * target + \
        jnp.log1p(jnp.exp(-jnp.abs(pred)))
    loss = bce * focal_weight
    if weight is not None:
        loss = loss * weight
    loss = jnp.sum(loss)
    if avg_factor is not None:
        loss = loss / jnp.maximum(avg_factor, 1.0)
    return loss


def chamfer_corner_loss(src_boxes: jnp.ndarray, dst_boxes: jnp.ndarray,
                        mode: str = 'l1',
                        group: str = 'g8') -> jnp.ndarray:
    """Per-box corner Chamfer distance src→dst (reference BBoxCDLoss).

    Args:
        src_boxes, dst_boxes: (..., 9).
    Returns:
        (..., ) per-box loss (mean over the 8 corners of the min-corner
        distance), matching reduction='none' + mean over corners.
    """
    sc = bbox_to_corners(src_boxes)  # (..., 8, 3)
    dc = bbox_to_corners(dst_boxes)

    def cham(s, d):
        diff = s[..., :, None, :] - d[..., None, :, :]  # (..., 8, 8, 3)
        if mode == 'l1':
            dist = jnp.sum(jnp.abs(diff), axis=-1)
        elif mode == 'l2':
            dist = jnp.sum(diff * diff, axis=-1)
        else:
            dist = jnp.sum(jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff,
                                     jnp.abs(diff) - 0.5), axis=-1)
        return jnp.mean(jnp.min(dist, axis=-1), axis=-1)

    if group == 'g8':
        return cham(sc, dc)
    return cham(sc[..., :4, :], dc[..., :4, :]) + \
        cham(sc[..., 4:, :], dc[..., 4:, :])


def binary_focal_cost(pred_logits: jnp.ndarray, gt_maps: jnp.ndarray,
                      text_mask: jnp.ndarray, alpha: float = 0.25,
                      gamma: float = 2.0, eps: float = 1e-12) -> jnp.ndarray:
    """BinaryFocalLossCost over masked text tokens.

    Args:
        pred_logits: (Q, T) query-token logits.
        gt_maps: (G, T) gt positive maps.
        text_mask: (T,) valid-token mask.
    Returns:
        (Q, G) cost.
    """
    m = text_mask.astype(pred_logits.dtype)
    p = 1 / (1 + jnp.exp(-pred_logits))
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * p ** gamma * m
    pos = -jnp.log(p + eps) * alpha * (1 - p) ** gamma * m
    gt = gt_maps * m
    return jnp.einsum('qt,gt->qg', pos, gt) + \
        jnp.einsum('qt,gt->qg', neg, (1 - gt) * m)


def bbox_l1_cost(pred_boxes: jnp.ndarray,
                 gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """(Q, 9) × (G, 9) → (Q, G) pairwise L1 (reference BBox3DL1Cost)."""
    return jnp.sum(jnp.abs(pred_boxes[:, None] - gt_boxes[None]), axis=-1)


def iou3d_cost(pred_boxes: jnp.ndarray, gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """(Q, G) negative exact IoU cost (reference IoU3DCost)."""
    return -box3d_iou(pred_boxes, gt_boxes)
