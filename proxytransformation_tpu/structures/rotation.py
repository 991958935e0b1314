"""Euler/rotation utilities (ZXY convention) in pure JAX.

Mirrors the semantics of pytorch3d's `euler_angles_to_matrix` /
`matrix_to_euler_angles` with the 'ZXY' convention and the reference's
`rotation_3d_in_euler` / `rotation_3d_in_axis` / `ortho_6d_2_Mat`
(reference: embodiedscan/structures/bbox_3d/utils.py:33-185,
embodiedscan/models/dense_heads/grounding_head.py:827-849). All
functions are shape-polymorphic over leading batch dims and jittable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([o, z, z], -1),
        jnp.stack([z, c, -s], -1),
        jnp.stack([z, s, c], -1),
    ], -2)


def _rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([c, z, s], -1),
        jnp.stack([z, o, z], -1),
        jnp.stack([-s, z, c], -1),
    ], -2)


def _rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


_AXIS_FNS = {'X': _rot_x, 'Y': _rot_y, 'Z': _rot_z}


def euler_angles_to_matrix(angles: jnp.ndarray,
                           convention: str = 'ZXY') -> jnp.ndarray:
    """(..., 3) euler angles → (..., 3, 3) rotation matrices.

    R = R_{c0}(a0) @ R_{c1}(a1) @ R_{c2}(a2), matching pytorch3d.
    """
    assert len(convention) == 3
    mats = [
        _AXIS_FNS[axis](angles[..., i]) for i, axis in enumerate(convention)
    ]
    # full fp32: the default matmul precision is bf16-like and corrupts
    # rotation orthonormality (geometry must stay exact, cf. the
    # reference's fp32 autocast guards).
    return jnp.matmul(jnp.matmul(mats[0], mats[1], precision='highest'),
                      mats[2], precision='highest')


def matrix_to_euler_angles(matrix: jnp.ndarray,
                           convention: str = 'ZXY') -> jnp.ndarray:
    """(..., 3, 3) rotation matrices → (..., 3) ZXY euler angles.

    Only the 'ZXY' convention (the one the reference uses everywhere) is
    implemented. For R = Rz(a) Rx(b) Ry(c):
      b = asin(m[2,1]); a = atan2(-m[0,1], m[1,1]); c = atan2(-m[2,0], m[2,2])
    """
    assert convention == 'ZXY', 'only ZXY is supported'
    m = matrix
    b = jnp.arcsin(jnp.clip(m[..., 2, 1], -1.0, 1.0))
    a = jnp.arctan2(-m[..., 0, 1], m[..., 1, 1])
    c = jnp.arctan2(-m[..., 2, 0], m[..., 2, 2])
    return jnp.stack([a, b, c], axis=-1)


def rotation_3d_in_euler(points: jnp.ndarray,
                         angles: jnp.ndarray,
                         return_mat: bool = False):
    """Rotate point sets by per-set euler angles.

    Args:
        points: (N, M, 3) (or (M, 3), broadcast to one set).
        angles: (N, 3) ZXY euler angles (or (3,)).
    Returns:
        (N, M, 3) rotated points; optionally the transposed matrices.
    """
    batch_free = points.ndim == 2
    if batch_free:
        points = points[None]
    if angles.ndim == 1:
        angles = jnp.broadcast_to(angles, points.shape[:1] + (3, ))
    rot_mat_T = jnp.swapaxes(euler_angles_to_matrix(angles, 'ZXY'), -2, -1)
    out = jnp.matmul(points, rot_mat_T, precision='highest')
    if batch_free:
        out = out[0]
        rot_mat_T = rot_mat_T[0]
    if return_mat:
        return out, rot_mat_T
    return out


def rotation_3d_in_axis(points: jnp.ndarray,
                        angles: jnp.ndarray,
                        axis: int = 0,
                        return_mat: bool = False):
    """Rotate (N, M, 3) points by (N,) angles about a single axis.

    Matches reference utils.py:90-185 (note its matrices are the
    transposed right-multiplication form).
    """
    batch_free = points.ndim == 2
    if batch_free:
        points = points[None]
    angles = jnp.asarray(angles)
    if angles.ndim == 0:
        angles = jnp.broadcast_to(angles, points.shape[:1])
    s, c = jnp.sin(angles), jnp.cos(angles)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    if axis in (1, -2):
        rot_T = jnp.stack([
            jnp.stack([c, z, -s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([s, z, c], -1),
        ], -2)
    elif axis in (2, -1):
        rot_T = jnp.stack([
            jnp.stack([c, s, z], -1),
            jnp.stack([-s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ], -2)
    elif axis in (0, -3):
        rot_T = jnp.stack([
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, s], -1),
            jnp.stack([z, -s, c], -1),
        ], -2)
    else:
        raise ValueError(f'axis should be in [-3, 2], got {axis}')
    out = jnp.matmul(points, rot_T, precision='highest')
    if batch_free:
        out = out[0]
        rot_T = rot_T[0]
    if return_mat:
        return out, rot_T
    return out


def ortho_6d_to_matrix(x_raw: jnp.ndarray, y_raw: jnp.ndarray) -> jnp.ndarray:
    """6D rotation parameterization → (..., 3, 3) rotation matrix.

    Matches reference grounding_head.py:838-849 (columns are x, y, z).
    """

    def _normalize(v):
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-8)

    y = _normalize(y_raw)
    z = _normalize(jnp.cross(x_raw, y))
    x = jnp.cross(y, z)
    return jnp.stack([x, y, z], axis=-1)
