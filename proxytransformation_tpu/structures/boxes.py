"""9-DoF Euler-angle 3D boxes as functional ops over padded arrays.

Re-designs the reference's box classes (reference:
embodiedscan/structures/bbox_3d/euler_box3d.py:12-283,
euler_depth_box3d.py:10-164, chamfer_distance.py:160-203) as pure
functions on `(N, 9)` float arrays `(cx, cy, cz, dx, dy, dz, α, β, γ)`
with ZXY euler angles, plus a thin `EulerBoxes` wrapper for API parity.
Everything is jittable and vmappable; no ragged shapes.
"""
from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from .rotation import euler_angles_to_matrix, matrix_to_euler_angles

# Corner sign pattern of the box class convention (reference
# euler_box3d.py:86-95): order
# (x0y0z0, x0y0z1, x0y1z1, x0y1z0, x1y0z0, x1y0z1, x1y1z1, x1y1z0),
# expressed as offsets in {0,1} minus the (0.5, 0.5, 0.5) origin.
_CORNER_NORM_BOX = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
     [1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0]], dtype=np.float32) - 0.5

# Sign pattern of the loss convention (reference chamfer_distance.py:187-195).
_CORNER_SIGNS_LOSS = np.array(
    [[1, 1, 1], [1, 1, -1], [1, -1, 1], [1, -1, -1],
     [-1, 1, 1], [-1, 1, -1], [-1, -1, 1], [-1, -1, -1]], dtype=np.float32)


def _pad_to_9(bbox: jnp.ndarray) -> jnp.ndarray:
    """Accept (N, 6), (N, 7) or (N, 9) and zero-pad euler angles."""
    d = bbox.shape[-1]
    if d == 9:
        return bbox
    if d in (6, 7):
        pad = jnp.zeros(bbox.shape[:-1] + (9 - d, ), bbox.dtype)
        return jnp.concatenate([bbox, pad], axis=-1)
    raise ValueError(f'box dim must be 6, 7 or 9, got {d}')


def box_corners(bbox: jnp.ndarray) -> jnp.ndarray:
    """(..., 9) boxes → (..., 8, 3) corners (box-class corner order)."""
    bbox = _pad_to_9(bbox)
    center = bbox[..., None, :3]
    dims = bbox[..., None, 3:6]
    corners = dims * jnp.asarray(_CORNER_NORM_BOX)
    rot = euler_angles_to_matrix(bbox[..., 6:9], 'ZXY')
    corners = jnp.matmul(corners, jnp.swapaxes(rot, -2, -1),
                         precision='highest')
    return corners + center


def bbox_to_corners(bbox: jnp.ndarray) -> jnp.ndarray:
    """(..., 9) boxes → (..., 8, 3) corners (loss corner order).

    Matches reference chamfer_distance.py:160-203 (used by BBoxCDLoss).
    """
    bbox = _pad_to_9(bbox)
    center = bbox[..., None, :3]
    half = bbox[..., None, 3:6] / 2.0
    corners = half * jnp.asarray(_CORNER_SIGNS_LOSS)
    rot = euler_angles_to_matrix(bbox[..., 6:9], 'ZXY')
    corners = jnp.matmul(corners, jnp.swapaxes(rot, -2, -1),
                         precision='highest')
    return corners + center


def box_transform(bbox: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 SE(3) `matrix` to (N, 9) boxes.

    Matches reference euler_box3d.py:187-207: centers are transformed
    homogeneously, sizes kept, rotations left-composed.
    """
    bbox = _pad_to_9(bbox)
    center = bbox[..., :3]
    center = jnp.matmul(center, matrix[:3, :3].T,
                        precision='highest') + matrix[:3, 3]
    ori = euler_angles_to_matrix(bbox[..., 6:9], 'ZXY')
    final = jnp.matmul(matrix[:3, :3], ori, precision='highest')
    angles = matrix_to_euler_angles(final, 'ZXY')
    return jnp.concatenate([center, bbox[..., 3:6], angles], axis=-1)


def box_flip(bbox: jnp.ndarray, direction: str = 'X') -> jnp.ndarray:
    """Flip boxes along an axis (reference euler_box3d.py:265-283)."""
    bbox = _pad_to_9(bbox)
    x, y, z = bbox[..., 0], bbox[..., 1], bbox[..., 2]
    a, b, c = bbox[..., 6], bbox[..., 7], bbox[..., 8]
    if direction == 'X':
        x, a, c = -x, -a + jnp.pi, -c
    elif direction == 'Y':
        y, a, b = -y, -a, -b + jnp.pi
    elif direction == 'Z':
        z, b, c = -z, -b, -c + jnp.pi
    else:
        raise ValueError(direction)
    return jnp.concatenate([
        jnp.stack([x, y, z], -1), bbox[..., 3:6],
        jnp.stack([a, b, c], -1)
    ], -1)


def points_in_boxes(points: jnp.ndarray, bbox: jnp.ndarray,
                    eps: float = 0.0) -> jnp.ndarray:
    """Point-in-box test: (N, 3) points × (M, 9) boxes → (N, M) bool.

    TPU-native replacement for mmcv's CUDA `points_in_boxes_all/part`
    (reference euler_depth_box3d.py:100-164): rotate each point into the
    box frame and bound-test — pure vector math, no kernel needed.
    """
    bbox = _pad_to_9(bbox)
    rot = euler_angles_to_matrix(bbox[..., 6:9], 'ZXY')  # (M, 3, 3)
    rel = points[:, None, :] - bbox[None, :, :3]  # (N, M, 3)
    # local = R^T @ rel
    local = jnp.einsum('nmi,mij->nmj', rel, rot, precision='highest')
    half = bbox[None, :, 3:6] / 2.0 + eps
    return jnp.all(jnp.abs(local) <= half, axis=-1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EulerBoxes:
    """Thin wrapper over a padded `(N, 9)` box tensor (depth coords).

    API-parity shim for the reference's `EulerDepthInstance3DBoxes`;
    all heavy lifting is in the functional ops above.
    """
    tensor: jnp.ndarray

    def __post_init__(self):
        self.tensor = _pad_to_9(jnp.asarray(self.tensor, jnp.float32))

    # pytree protocol
    def tree_flatten(self):
        return (self.tensor, ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.tensor = children[0]
        return obj

    def __len__(self):
        return self.tensor.shape[0]

    @property
    def gravity_center(self):
        return self.tensor[:, :3]

    @property
    def dims(self):
        return self.tensor[:, 3:6]

    @property
    def corners(self):
        return box_corners(self.tensor)

    @property
    def volume(self):
        return jnp.prod(self.tensor[:, 3:6], axis=-1)

    def transform(self, matrix):
        return EulerBoxes(box_transform(self.tensor, jnp.asarray(matrix)))

    def scale(self, factor: float):
        return EulerBoxes(
            jnp.concatenate(
                [self.tensor[:, :6] * factor, self.tensor[:, 6:]], -1))

    def rotate(self, angle: Union[float, jnp.ndarray]):
        angle = jnp.asarray(angle)
        if angle.ndim == 0:
            angle = jnp.stack([angle, jnp.zeros(()), jnp.zeros(())])
        if angle.shape == (3, ):
            rot = euler_angles_to_matrix(angle, 'ZXY')
        elif angle.shape == (3, 3):
            rot = angle
        else:
            raise ValueError(f'bad rotation {angle.shape}')
        mat = jnp.eye(4).at[:3, :3].set(rot)
        return self.transform(mat)

    def flip(self, direction='X'):
        return EulerBoxes(box_flip(self.tensor, direction))

    def overlaps(self, other: 'EulerBoxes', eps: float = 1e-4):
        from ..ops.box3d_overlap import box3d_iou
        return box3d_iou(self.tensor, other.tensor, eps=eps)
