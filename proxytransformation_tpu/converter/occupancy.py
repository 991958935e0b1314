"""Occupancy annotation extraction.

Replaces the reference's `extract_occupancy_ann.py`: rasterize a
labeled scene point cloud into sparse (x, y, z, label) occupancy
annotations on a fixed grid.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def extract_occupancy_annotations(points: np.ndarray, labels: np.ndarray,
                                  voxel_range: Sequence[float],
                                  grid_shape: Tuple[int, int, int],
                                  min_points: int = 1) -> np.ndarray:
    """Points + per-point labels → (M, 4) sparse occupancy (majority label).

    Args:
        points: (N, 3); labels: (N,) int semantic ids (>0; 0 = empty).
        voxel_range: (6,) xyzmin..xyzmax; grid_shape: (X, Y, Z).
    """
    X, Y, Z = grid_shape
    lo = np.asarray(voxel_range[:3], np.float32)
    hi = np.asarray(voxel_range[3:6], np.float32)
    vox = (hi - lo) / np.asarray([X, Y, Z], np.float32)
    q = np.floor((points - lo) / vox).astype(np.int64)
    ok = np.all((q >= 0) & (q < [X, Y, Z]), -1)
    q, lab = q[ok], np.asarray(labels)[ok]
    flat = (q[:, 0] * Y + q[:, 1]) * Z + q[:, 2]
    out = []
    order = np.argsort(flat, kind='stable')
    flat, lab, q = flat[order], lab[order], q[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(flat))[0] + 1,
                             [len(flat)]])
    for s, e in zip(starts[:-1], starts[1:]):
        if e - s < min_points:
            continue
        vals, counts = np.unique(lab[s:e], return_counts=True)
        out.append([*q[s], vals[np.argmax(counts)]])
    return np.asarray(out, np.int32).reshape(-1, 4)
