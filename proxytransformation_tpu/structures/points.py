"""Points containers (Camera/Depth/LiDAR coordinate frames).

API-parity shim for the reference's points family (reference:
structures/points/base_points.py:1-522 and camera/depth/lidar
subclasses): a thin wrapper over a padded (N, D) array whose first 3
columns are xyz, with coordinate-frame tagged conversions. Functional —
all mutators return new instances.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Union

import numpy as np
import jax.numpy as jnp

# Coordinate conversion conventions follow the reference Coord3DMode
# (structures/bbox_3d/coord_3d_mode.py:17-272):
#   CAM:   x right, y down, z front
#   DEPTH: x right, y front, z up
#   LIDAR: x front, y left, z up
_CONVERSIONS = {
    ('CAMERA', 'DEPTH'): np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]],
                                  np.float32),
    ('DEPTH', 'CAMERA'): np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]],
                                  np.float32),
    ('DEPTH', 'LIDAR'): np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]],
                                 np.float32),
    ('LIDAR', 'DEPTH'): np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]],
                                 np.float32),
    ('CAMERA', 'LIDAR'): np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]],
                                  np.float32),
    ('LIDAR', 'CAMERA'): np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]],
                                  np.float32),
}


@dataclasses.dataclass
class BasePoints:
    tensor: jnp.ndarray
    points_dim: int = 3
    attribute_dims: Optional[Dict] = None
    coord_frame: str = 'DEPTH'

    def __post_init__(self):
        self.tensor = jnp.asarray(self.tensor, jnp.float32).reshape(
            -1, self.points_dim)

    def __len__(self):
        return self.tensor.shape[0]

    @property
    def coord(self):
        return self.tensor[:, :3]

    @property
    def shape(self):
        return self.tensor.shape

    def _new(self, tensor):
        return dataclasses.replace(self, tensor=tensor)

    def translate(self, trans):
        t = self.tensor.at[:, :3].add(jnp.asarray(trans))
        return self._new(t)

    def rotate(self, rot_mat_t):
        """p[:, :3] @ rot_mat_t (the reference's right-multiplication)."""
        xyz = jnp.matmul(self.tensor[:, :3], jnp.asarray(rot_mat_t),
                         precision='highest')
        return self._new(self.tensor.at[:, :3].set(xyz))

    def scale(self, factor: float):
        return self._new(self.tensor.at[:, :3].multiply(factor))

    def flip(self, bev_direction: str = 'horizontal'):
        idx = 0 if bev_direction == 'horizontal' else 1
        return self._new(self.tensor.at[:, idx].multiply(-1.0))

    def convert_to(self, dst: str) -> 'BasePoints':
        if dst == self.coord_frame:
            return self
        mat = _CONVERSIONS[(self.coord_frame, dst)]
        xyz = jnp.matmul(self.tensor[:, :3], jnp.asarray(mat).T,
                         precision='highest')
        out = dataclasses.replace(self,
                                  tensor=self.tensor.at[:, :3].set(xyz))
        out.coord_frame = dst
        return out

    def in_range_3d(self, point_range):
        r = jnp.asarray(point_range)
        return jnp.all((self.coord >= r[:3]) & (self.coord <= r[3:6]), -1)


@dataclasses.dataclass
class CameraPoints(BasePoints):
    coord_frame: str = 'CAMERA'


@dataclasses.dataclass
class DepthPoints(BasePoints):
    coord_frame: str = 'DEPTH'


@dataclasses.dataclass
class LiDARPoints(BasePoints):
    coord_frame: str = 'LIDAR'


def get_points_type(coord_type: str):
    return {'CAMERA': CameraPoints, 'DEPTH': DepthPoints,
            'LIDAR': LiDARPoints}[coord_type]
