"""Visualization geometry helpers.

Replaces the reference's `_9dof_to_box` + line-mesh utilities
(reference: visualization/utils.py, utils/line_mesh.py): box→corner
conversion and wireframe segment generation, backend-agnostic (numpy),
with optional open3d construction when the library is present.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..structures.boxes import box_corners

# 12 box edges over the reference corner ordering
_EDGES = np.array([[0, 1], [1, 2], [2, 3], [3, 0], [4, 5], [5, 6], [6, 7],
                   [7, 4], [0, 4], [1, 5], [2, 6], [3, 7]])


def nine_dof_to_corners(box9: np.ndarray) -> np.ndarray:
    """(9,) or (N, 9) box → (N, 8, 3) numpy corners."""
    b = np.asarray(box9, np.float32).reshape(-1, 9)
    return np.asarray(box_corners(jnp.asarray(b)))


def box_lines(box9: np.ndarray):
    """(N, 9) boxes → (N, 12, 2, 3) wireframe segments."""
    corners = nine_dof_to_corners(box9)
    return corners[:, _EDGES]  # (N, 12, 2, 3)


def line_mesh_segments(points: np.ndarray, lines: np.ndarray,
                       radius: float = 0.02):
    """Cylinder segments for thick wireframes (reference line_mesh.py).

    Returns per-segment (start, end, radius) tuples; when open3d is
    available `to_open3d` turns them into TriangleMeshes.
    """
    return [(points[a], points[b], radius) for a, b in lines]


def to_open3d_box(box9: np.ndarray, color=(0, 1, 0)):
    """9-DoF box → open3d.geometry.OrientedBoundingBox (if installed)."""
    import open3d as o3d
    from ..structures.rotation import euler_angles_to_matrix
    b = np.asarray(box9, np.float32).reshape(9)
    rot = np.asarray(euler_angles_to_matrix(jnp.asarray(b[6:9]), 'ZXY'))
    obb = o3d.geometry.OrientedBoundingBox(b[:3].reshape(3, 1),
                                           rot.astype(np.float64),
                                           b[3:6].reshape(3, 1))
    obb.color = color
    return obb
