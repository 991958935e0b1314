import numpy as np
import jax.numpy as jnp
import pytest

from proxytransformation_tpu.ops import box3d_iou, box3d_intersection_volume
from proxytransformation_tpu.structures import box_corners


def test_identical_boxes_iou_one():
    rng = np.random.RandomState(0)
    boxes = np.concatenate([
        rng.uniform(-2, 2, (8, 3)),
        rng.uniform(0.5, 2.0, (8, 3)),
        rng.uniform(-np.pi, np.pi, (8, 3)),
    ], -1).astype(np.float32)
    iou = np.asarray(box3d_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=2e-3)


def test_disjoint_boxes_iou_zero():
    b1 = jnp.asarray([[0, 0, 0, 1, 1, 1, 0.3, 0.2, 0.1]], jnp.float32)
    b2 = jnp.asarray([[10, 10, 10, 1, 1, 1, 0.1, 0.5, 0.2]], jnp.float32)
    iou = np.asarray(box3d_iou(b1, b2))
    np.testing.assert_allclose(iou, 0.0, atol=1e-6)


def test_axis_aligned_analytic():
    b1 = jnp.asarray([[0, 0, 0, 2, 2, 2, 0, 0, 0]], jnp.float32)
    b2 = jnp.asarray([[1, 1, 1, 2, 2, 2, 0, 0, 0]], jnp.float32)
    vol = np.asarray(box3d_intersection_volume(b1, b2))
    np.testing.assert_allclose(vol, 1.0, atol=1e-4)  # 1x1x1 overlap
    iou = np.asarray(box3d_iou(b1, b2))
    np.testing.assert_allclose(iou, 1.0 / 15.0, atol=1e-4)


def test_contained_box():
    outer = jnp.asarray([[0, 0, 0, 4, 4, 4, 0.5, 0.2, -0.3]], jnp.float32)
    # small box at the center, any rotation: fully contained
    inner = jnp.asarray([[0, 0, 0, 1, 1, 1, -0.7, 0.9, 0.4]], jnp.float32)
    vol = np.asarray(box3d_intersection_volume(outer, inner))
    np.testing.assert_allclose(vol, 1.0, atol=1e-3)
    iou = np.asarray(box3d_iou(outer, inner))
    np.testing.assert_allclose(iou, 1.0 / 64.0, atol=1e-4)


def _halfspace_volume_oracle(box1, box2):
    """Oracle via scipy HalfspaceIntersection + ConvexHull."""
    from scipy.spatial import ConvexHull, HalfspaceIntersection
    from proxytransformation_tpu.ops.box3d_overlap import box_planes
    n1, b1 = box_planes(jnp.asarray(box1))
    n2, b2 = box_planes(jnp.asarray(box2))
    A = np.concatenate([np.asarray(n1), np.asarray(n2)], 0)
    b = np.concatenate([np.asarray(b1), np.asarray(b2)], 0)
    # find an interior point via the centroid midpoint heuristic
    # fall back to a small LP via scipy.optimize.linprog
    from scipy.optimize import linprog
    # maximize slack t s.t. A x + t <= b
    res = linprog(c=[0, 0, 0, -1],
                  A_ub=np.concatenate([A, np.ones((12, 1))], 1), b_ub=b,
                  bounds=[(None, None)] * 3 + [(None, None)], method='highs')
    if not res.success or res.x[3] <= 1e-9:
        return 0.0
    interior = res.x[:3]
    hs = HalfspaceIntersection(np.concatenate([A, -b[:, None]], 1), interior)
    return ConvexHull(hs.intersections).volume


def test_random_rotated_vs_scipy_oracle():
    rng = np.random.RandomState(7)
    n_checked = 0
    for _ in range(20):
        box1 = np.concatenate([
            rng.uniform(-1, 1, 3), rng.uniform(0.8, 2.5, 3),
            rng.uniform(-np.pi, np.pi, 3)
        ]).astype(np.float32)
        box2 = np.concatenate([
            box1[:3] + rng.uniform(-1, 1, 3), rng.uniform(0.8, 2.5, 3),
            rng.uniform(-np.pi, np.pi, 3)
        ]).astype(np.float32)
        want = _halfspace_volume_oracle(box1, box2)
        got = float(box3d_intersection_volume(jnp.asarray(box1[None]),
                                              jnp.asarray(box2[None]))[0, 0])
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)
        n_checked += 1
    assert n_checked == 20


def test_corners_consistent_with_planes():
    # all 8 corners of a box must satisfy its own half-spaces tightly
    from proxytransformation_tpu.ops.box3d_overlap import box_planes
    rng = np.random.RandomState(9)
    box = np.concatenate([
        rng.uniform(-1, 1, 3), rng.uniform(0.5, 2, 3),
        rng.uniform(-np.pi, np.pi, 3)
    ]).astype(np.float32)
    corners = np.asarray(box_corners(jnp.asarray(box[None])))[0]
    n, b = box_planes(jnp.asarray(box))
    slack = corners @ np.asarray(n).T - np.asarray(b)[None]
    assert np.all(slack <= 1e-4)
    # every plane is touched by 4 corners
    touching = np.sum(np.abs(slack) < 1e-4, axis=0)
    np.testing.assert_array_equal(touching, [4] * 6)
