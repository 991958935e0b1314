"""3D NMS over oriented boxes, TPU-native.

Replaces mmcv's CUDA `nms3d` / `nms3d_normal` (reference:
models/dense_heads/fcaf3d_head.py:15,791-796). The IoU matrix comes
from the exact box IoU kernel (box3d_overlap.py); suppression is the
classic greedy pass expressed as a fixed-length `fori_loop` over the
score-sorted order — static shapes, no host sync.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .box3d_overlap import box3d_iou


def _aabb_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned IoU ignoring rotation (nms3d_normal semantics)."""
    min1 = boxes1[:, :3] - boxes1[:, 3:6] / 2
    max1 = boxes1[:, :3] + boxes1[:, 3:6] / 2
    min2 = boxes2[:, :3] - boxes2[:, 3:6] / 2
    max2 = boxes2[:, :3] + boxes2[:, 3:6] / 2
    lo = jnp.maximum(min1[:, None], min2[None])
    hi = jnp.minimum(max1[:, None], max2[None])
    inter = jnp.prod(jnp.clip(hi - lo, 0.0, None), axis=-1)
    v1 = jnp.prod(max1 - min1, axis=-1)
    v2 = jnp.prod(max2 - min2, axis=-1)
    return inter / jnp.maximum(v1[:, None] + v2[None] - inter, 1e-8)


@partial(jax.jit, static_argnames=('use_rotation', ))
def nms3d(boxes: jnp.ndarray,
          scores: jnp.ndarray,
          iou_threshold: float = 0.5,
          mask: jnp.ndarray = None,
          use_rotation: bool = True) -> jnp.ndarray:
    """Greedy NMS.

    Args:
        boxes: (N, 9) oriented boxes.
        scores: (N,) scores.
        iou_threshold: suppression threshold.
        mask: optional (N,) validity.
        use_rotation: exact oriented IoU if True, else axis-aligned.
    Returns:
        keep: (N,) bool — True for boxes kept.
    """
    N = boxes.shape[0]
    if mask is None:
        mask = jnp.ones((N, ), bool)
    order = jnp.argsort(jnp.where(mask, -scores, jnp.inf))
    sboxes = boxes[order]
    smask = mask[order]
    iou = box3d_iou(sboxes, sboxes) if use_rotation else _aabb_iou(
        sboxes, sboxes)

    def body(i, keep):
        alive = keep[i] & smask[i]
        suppress = (iou[i] > iou_threshold) & (jnp.arange(N) > i) & alive
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, N, body, smask)
    # un-sort
    inv = jnp.zeros((N, ), jnp.int32).at[order].set(jnp.arange(N, dtype=jnp.int32))
    return keep[inv]
