import numpy as np
import jax.numpy as jnp
import pytest

from proxytransformation_tpu.structures import (euler_angles_to_matrix,
                                                matrix_to_euler_angles,
                                                rotation_3d_in_euler,
                                                rotation_3d_in_axis,
                                                ortho_6d_to_matrix)


def np_rot(axis, a):
    c, s = np.cos(a), np.sin(a)
    if axis == 'X':
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == 'Y':
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def np_euler_zxy(angles):
    a, b, c = angles
    return np_rot('Z', a) @ np_rot('X', b) @ np_rot('Y', c)


def test_euler_to_matrix_matches_oracle():
    rng = np.random.RandomState(0)
    angles = rng.uniform(-np.pi, np.pi, (32, 3)).astype(np.float32)
    got = np.asarray(euler_angles_to_matrix(jnp.asarray(angles), 'ZXY'))
    want = np.stack([np_euler_zxy(a) for a in angles])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_matrix_euler_roundtrip():
    rng = np.random.RandomState(1)
    # keep central angle away from gimbal lock
    angles = np.stack([
        rng.uniform(-np.pi, np.pi, 64),
        rng.uniform(-1.4, 1.4, 64),
        rng.uniform(-np.pi, np.pi, 64),
    ], -1).astype(np.float32)
    mats = euler_angles_to_matrix(jnp.asarray(angles), 'ZXY')
    rec = matrix_to_euler_angles(mats, 'ZXY')
    mats2 = euler_angles_to_matrix(rec, 'ZXY')
    np.testing.assert_allclose(np.asarray(mats), np.asarray(mats2), atol=1e-4)


def test_rotation_3d_in_euler():
    rng = np.random.RandomState(2)
    pts = rng.randn(4, 7, 3).astype(np.float32)
    ang = rng.uniform(-1, 1, (4, 3)).astype(np.float32)
    got = np.asarray(rotation_3d_in_euler(jnp.asarray(pts), jnp.asarray(ang)))
    for i in range(4):
        want = pts[i] @ np_euler_zxy(ang[i]).T
        np.testing.assert_allclose(got[i], want, atol=1e-5)


@pytest.mark.parametrize('axis', [0, 1, 2])
def test_rotation_3d_in_axis_is_rotation(axis):
    rng = np.random.RandomState(3)
    pts = rng.randn(5, 6, 3).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, (5, )).astype(np.float32)
    out = np.asarray(rotation_3d_in_axis(jnp.asarray(pts), jnp.asarray(ang),
                                         axis=axis))
    # norms preserved
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1),
                               np.linalg.norm(pts, axis=-1), atol=1e-5)
    # the rotation axis coordinate is unchanged
    np.testing.assert_allclose(out[..., axis], pts[..., axis], atol=1e-5)


def test_ortho6d_is_rotation():
    rng = np.random.RandomState(4)
    x = rng.randn(16, 3).astype(np.float32)
    y = rng.randn(16, 3).astype(np.float32)
    m = np.asarray(ortho_6d_to_matrix(jnp.asarray(x), jnp.asarray(y)))
    eye = np.einsum('nij,nkj->nik', m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)),
                               atol=1e-4)
    dets = np.linalg.det(m)
    np.testing.assert_allclose(dets, np.ones(16), atol=1e-4)
