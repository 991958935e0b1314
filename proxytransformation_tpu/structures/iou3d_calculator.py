"""Axis-aligned / nearest-BEV IoU calculators.

Re-implementation of the reference calculators (reference:
structures/ops/iou3d_calculator.py:10-331): `BboxOverlapsNearest3D`
approximates rotated boxes by their nearest axis-aligned BEV box, and
`axis_aligned_bbox_overlaps_3d` is the exact axis-aligned 3D overlap.
"""
from __future__ import annotations

import jax.numpy as jnp


def axis_aligned_bbox_overlaps_3d(bboxes1: jnp.ndarray,
                                  bboxes2: jnp.ndarray,
                                  mode: str = 'iou',
                                  eps: float = 1e-6) -> jnp.ndarray:
    """(N, 6) × (M, 6) boxes as (x1, y1, z1, x2, y2, z2) → (N, M)."""
    lo = jnp.maximum(bboxes1[:, None, :3], bboxes2[None, :, :3])
    hi = jnp.minimum(bboxes1[:, None, 3:], bboxes2[None, :, 3:])
    inter = jnp.prod(jnp.clip(hi - lo, 0, None), -1)
    v1 = jnp.prod(bboxes1[:, 3:] - bboxes1[:, :3], -1)
    v2 = jnp.prod(bboxes2[:, 3:] - bboxes2[:, :3], -1)
    if mode == 'giou':
        glo = jnp.minimum(bboxes1[:, None, :3], bboxes2[None, :, :3])
        ghi = jnp.maximum(bboxes1[:, None, 3:], bboxes2[None, :, 3:])
        hull = jnp.prod(jnp.clip(ghi - glo, 0, None), -1)
        union = v1[:, None] + v2[None] - inter
        iou = inter / jnp.maximum(union, eps)
        return iou - (hull - union) / jnp.maximum(hull, eps)
    union = v1[:, None] + v2[None] - inter if mode == 'iou' else \
        jnp.broadcast_to(v1[:, None], inter.shape)
    return inter / jnp.maximum(union, eps)


def bbox_overlaps_nearest_3d(bboxes1: jnp.ndarray, bboxes2: jnp.ndarray,
                             mode: str = 'iou') -> jnp.ndarray:
    """Nearest-axis-aligned approximation for 7/9-DoF boxes."""
    def to_aabb(b):
        half = b[:, 3:6] / 2
        return jnp.concatenate([b[:, :3] - half, b[:, :3] + half], -1)

    return axis_aligned_bbox_overlaps_3d(to_aabb(bboxes1), to_aabb(bboxes2),
                                         mode)


class BboxOverlapsNearest3D:

    def __init__(self, coordinate: str = 'lidar'):
        self.coordinate = coordinate

    def __call__(self, bboxes1, bboxes2, mode='iou', is_aligned=False):
        iou = bbox_overlaps_nearest_3d(bboxes1, bboxes2, mode)
        if is_aligned:
            return jnp.diagonal(iou)
        return iou
