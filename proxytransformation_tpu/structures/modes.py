"""Box3DMode / Coord3DMode converters.

Re-implementation of the reference mode system (reference:
structures/bbox_3d/box_3d_mode.py:14-258, coord_3d_mode.py:17-272):
enum-tagged conversion of boxes and points between the CAM / LIDAR /
DEPTH conventions.
"""
from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from .points import _CONVERSIONS


class Box3DMode(enum.IntEnum):
    LIDAR = 0
    CAM = 1
    DEPTH = 2


class Coord3DMode(enum.IntEnum):
    LIDAR = 0
    CAM = 1
    DEPTH = 2


_NAMES = {Box3DMode.LIDAR: 'LIDAR', Box3DMode.CAM: 'CAMERA',
          Box3DMode.DEPTH: 'DEPTH'}


def _rot_for(src, dst):
    s = _NAMES[Box3DMode(int(src))]
    d = _NAMES[Box3DMode(int(dst))]
    if s == d:
        return np.eye(3, dtype=np.float32)
    return _CONVERSIONS[(s, d)]


def convert_point(points: jnp.ndarray, src: Coord3DMode,
                  dst: Coord3DMode) -> jnp.ndarray:
    """(N, 3+) points → converted coordinates (extra dims preserved)."""
    rot = jnp.asarray(_rot_for(src, dst))
    xyz = jnp.matmul(points[..., :3], rot.T, precision='highest')
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def convert_box(boxes: jnp.ndarray, src: Box3DMode,
                dst: Box3DMode) -> jnp.ndarray:
    """(N, 9) euler boxes → converted frame.

    Centers rotate with the frame change; sizes are measured along the
    box's LOCAL axes and are invariant; orientations compose with the
    frame rotation (left-multiplied) and are re-extracted as ZXY euler.
    """
    from .rotation import euler_angles_to_matrix, matrix_to_euler_angles
    rot = jnp.asarray(_rot_for(src, dst))
    center = jnp.matmul(boxes[..., :3], rot.T, precision='highest')
    size = boxes[..., 3:6]
    ori = euler_angles_to_matrix(boxes[..., 6:9], 'ZXY')
    new_rot = jnp.matmul(rot[None], ori, precision='highest')
    angles = matrix_to_euler_angles(new_rot, 'ZXY')
    return jnp.concatenate([center, size, angles], axis=-1)
