"""Numpy box operations (host-side oracles and data tooling).

Compact re-implementation of the reference's numpy kernel library
(reference: structures/ops/box_np_ops.py:14-839): corner generation,
points-in-convex-polygon / points-in-rbbox tests, axis-aligned `iou_jit`,
camera↔lidar conversions of the pieces the data tooling uses.
"""
from __future__ import annotations

import numpy as np


def corners_nd(dims: np.ndarray, origin: float = 0.5) -> np.ndarray:
    """(N, ndim) dims → (N, 2**ndim, ndim) corners."""
    ndim = dims.shape[1]
    corners_norm = np.stack(np.unravel_index(np.arange(2 ** ndim),
                                             [2] * ndim), axis=1)
    if ndim == 2:
        corners_norm = corners_norm[[0, 1, 3, 2]]
    elif ndim == 3:
        corners_norm = corners_norm[[0, 1, 3, 2, 4, 5, 7, 6]]
    corners_norm = corners_norm - np.array(origin, dims.dtype)
    return dims.reshape(-1, 1, ndim) * corners_norm.reshape(
        1, 2 ** ndim, ndim)


def rotation_2d(points: np.ndarray, angles: np.ndarray) -> np.ndarray:
    """Rotate (N, K, 2) points by (N,) angles (counterclockwise)."""
    c, s = np.cos(angles), np.sin(angles)
    rot = np.stack([np.stack([c, -s]), np.stack([s, c])])  # (2,2,N)
    return np.einsum('aij,jka->aik', points, rot)


def center_to_corner_box2d(centers, dims, angles=None, origin=0.5):
    corners = corners_nd(dims, origin)
    if angles is not None:
        corners = rotation_2d(corners, angles)
    return corners + centers.reshape(-1, 1, 2)


def center_to_corner_box3d(centers, dims, angles=None, origin=0.5, axis=2):
    corners = corners_nd(dims, origin)
    if angles is not None:
        c, s = np.cos(angles), np.sin(angles)
        o, z = np.ones_like(c), np.zeros_like(c)
        if axis == 2:
            rot = np.stack([np.stack([c, -s, z]), np.stack([s, c, z]),
                            np.stack([z, z, o])])
        elif axis == 1:
            rot = np.stack([np.stack([c, z, s]), np.stack([z, o, z]),
                            np.stack([-s, z, c])])
        else:
            rot = np.stack([np.stack([o, z, z]), np.stack([z, c, -s]),
                            np.stack([z, s, c])])
        corners = np.einsum('aij,jka->aik', corners, rot)
    return corners + centers.reshape(-1, 1, 3)


def points_in_convex_polygon_2d(points: np.ndarray,
                                polygon: np.ndarray) -> np.ndarray:
    """(N, 2) points × (M, K, 2) convex polygons (ccw) → (N, M) bool."""
    edges = np.roll(polygon, -1, axis=1) - polygon  # (M, K, 2)
    rel = points[:, None, None, :] - polygon[None]  # (N, M, K, 2)
    cross = edges[None, ..., 0] * rel[..., 1] - \
        edges[None, ..., 1] * rel[..., 0]
    return np.all(cross >= 0, axis=-1) | np.all(cross <= 0, axis=-1)


def points_in_rbbox(points: np.ndarray, boxes7: np.ndarray,
                    origin=(0.5, 0.5, 0.5)) -> np.ndarray:
    """(N, 3) points × (M, 7) yaw boxes → (N, M) bool."""
    centers = boxes7[:, :3]
    dims = boxes7[:, 3:6]
    yaw = boxes7[:, 6]
    rel = points[:, None, :] - centers[None]
    c, s = np.cos(-yaw), np.sin(-yaw)
    x = rel[..., 0] * c[None] - rel[..., 1] * s[None]
    y = rel[..., 0] * s[None] + rel[..., 1] * c[None]
    z = rel[..., 2]
    return ((np.abs(x) <= dims[None, :, 0] / 2)
            & (np.abs(y) <= dims[None, :, 1] / 2)
            & (np.abs(z) <= dims[None, :, 2] / 2))


def iou_jit(boxes: np.ndarray, query_boxes: np.ndarray,
            eps: float = 1.0) -> np.ndarray:
    """Axis-aligned 2D IoU of (N, 4) × (K, 4) boxes (the reference's
    numba kernel, vectorized)."""
    area_q = ((query_boxes[:, 2] - query_boxes[:, 0] + eps)
              * (query_boxes[:, 3] - query_boxes[:, 1] + eps))
    area_b = ((boxes[:, 2] - boxes[:, 0] + eps)
              * (boxes[:, 3] - boxes[:, 1] + eps))
    iw = (np.minimum(boxes[:, None, 2], query_boxes[None, :, 2])
          - np.maximum(boxes[:, None, 0], query_boxes[None, :, 0]) + eps)
    ih = (np.minimum(boxes[:, None, 3], query_boxes[None, :, 3])
          - np.maximum(boxes[:, None, 1], query_boxes[None, :, 1]) + eps)
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    return inter / (area_b[:, None] + area_q[None] - inter)
