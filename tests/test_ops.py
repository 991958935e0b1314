import numpy as np
import jax.numpy as jnp
import pytest

from proxytransformation_tpu.ops import (ball_query, sample_farthest_points,
                                         masked_gather, hungarian_assign,
                                         nms3d)


def np_ball_query(centers, points, K, radius, mask=None):
    """Numpy oracle: first K in point order within radius (pytorch3d)."""
    B, M, _ = centers.shape
    N = points.shape[1]
    idx = np.full((B, M, K), -1, np.int64)
    for b in range(B):
        for m in range(M):
            d = np.linalg.norm(points[b] - centers[b, m], axis=-1)
            ok = d < radius
            if mask is not None:
                ok &= mask[b]
            sel = np.nonzero(ok)[0][:K]
            idx[b, m, :len(sel)] = sel
    return idx


def test_ball_query_matches_oracle():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-2, 2, (2, 500, 3)).astype(np.float32)
    ctr = rng.uniform(-2, 2, (2, 17, 3)).astype(np.float32)
    idx, grouped = ball_query(jnp.asarray(ctr), jnp.asarray(pts), K=8,
                              radius=0.7, chunk=128)
    want = np_ball_query(ctr, pts, 8, 0.7)
    np.testing.assert_array_equal(np.asarray(idx), want)
    # grouped points are the gathered points, zero at padding
    got = np.asarray(grouped)
    for b in range(2):
        for m in range(17):
            for k in range(8):
                if want[b, m, k] >= 0:
                    np.testing.assert_allclose(got[b, m, k],
                                               pts[b, want[b, m, k]])
                else:
                    np.testing.assert_allclose(got[b, m, k], 0.0)


def test_ball_query_respects_mask():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-1, 1, (1, 100, 3)).astype(np.float32)
    ctr = pts[:, :5].copy()
    mask = np.ones((1, 100), bool)
    mask[0, :50] = False
    idx, _ = ball_query(jnp.asarray(ctr), jnp.asarray(pts), K=4, radius=0.5,
                        points_mask=jnp.asarray(mask), chunk=32)
    want = np_ball_query(ctr, pts, 4, 0.5, mask)
    np.testing.assert_array_equal(np.asarray(idx), want)


def np_fps(points, K):
    """Numpy port of the reference's naive FPS oracle
    (preshape_norm_reverse_drop.py:527-625)."""
    P = points.shape[0]
    out = np.zeros(K, np.int64)
    closest = np.full(P, np.inf)
    sel = 0
    for i in range(1, K):
        d = np.sum((points - points[sel]) ** 2, -1)
        closest = np.minimum(closest, d)
        sel = int(np.argmax(closest))
        out[i] = sel
    return out


def test_fps_matches_oracle():
    rng = np.random.RandomState(2)
    pts = rng.randn(3, 64, 3).astype(np.float32)
    sampled, idx = sample_farthest_points(jnp.asarray(pts), K=10)
    for b in range(3):
        want = np_fps(pts[b], 10)
        np.testing.assert_array_equal(np.asarray(idx[b]), want)
        np.testing.assert_allclose(np.asarray(sampled[b]), pts[b][want])


def test_fps_mask_excludes_invalid():
    rng = np.random.RandomState(3)
    pts = rng.randn(1, 32, 3).astype(np.float32)
    mask = np.zeros((1, 32), bool)
    mask[0, 8:24] = True
    _, idx = sample_farthest_points(jnp.asarray(pts), K=6,
                                    mask=jnp.asarray(mask))
    assert np.all((np.asarray(idx) >= 8) & (np.asarray(idx) < 24))


def test_masked_gather_3d_idx():
    pts = jnp.arange(24, dtype=jnp.float32).reshape(1, 8, 3)
    idx = jnp.array([[[0, 3, -1], [7, -1, -1]]])
    out = np.asarray(masked_gather(pts, idx))
    np.testing.assert_allclose(out[0, 0, 0], [0, 1, 2])
    np.testing.assert_allclose(out[0, 0, 1], [9, 10, 11])
    np.testing.assert_allclose(out[0, 0, 2], 0.0)
    np.testing.assert_allclose(out[0, 1, 0], [21, 22, 23])


@pytest.mark.parametrize('method', ['dp', 'callback'])
def test_hungarian_matches_scipy(method):
    from scipy.optimize import linear_sum_assignment
    rng = np.random.RandomState(4)
    cost = rng.rand(2, 6, 4).astype(np.float32)
    num_gts = np.array([4, 2], np.int32)
    out = np.asarray(hungarian_assign(jnp.asarray(cost),
                                      jnp.asarray(num_gts), method=method))
    for b in range(2):
        rows, cols = linear_sum_assignment(cost[b, :, :num_gts[b]])
        # same total cost (tie-breaking may differ between methods)
        want_cost = cost[b, rows, cols].sum()
        got_rows = np.nonzero(out[b] >= 0)[0]
        got_cost = cost[b, got_rows, out[b][got_rows]].sum()
        assert len(got_rows) == num_gts[b]
        assert len(np.unique(out[b][got_rows])) == num_gts[b]
        np.testing.assert_allclose(got_cost, want_cost, atol=1e-5)


def test_hungarian_dp_random_optimality():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.RandomState(5)
    for _ in range(10):
        Q, G = 32, 7
        cost = rng.randn(1, Q, G).astype(np.float32)
        ng = rng.randint(0, G + 1)
        out = np.asarray(hungarian_assign(jnp.asarray(cost),
                                          jnp.asarray([ng], np.int32)))[0]
        got_rows = np.nonzero(out >= 0)[0]
        assert len(got_rows) == ng
        got_cost = cost[0, got_rows, out[got_rows]].sum() if ng else 0.0
        if ng:
            rows, cols = linear_sum_assignment(cost[0, :, :ng])
            np.testing.assert_allclose(got_cost, cost[0, rows, cols].sum(),
                                       atol=1e-4)


def test_nms3d_suppresses_duplicates():
    boxes = jnp.asarray(np.array([
        [0, 0, 0, 1, 1, 1, 0, 0, 0],
        [0.05, 0, 0, 1, 1, 1, 0, 0, 0],   # near-duplicate of box 0
        [5, 5, 5, 1, 1, 1, 0, 0, 0],      # far away
    ], np.float32))
    scores = jnp.asarray(np.array([0.9, 0.8, 0.7], np.float32))
    keep = np.asarray(nms3d(boxes, scores, iou_threshold=0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_multiclass_nms_device_matches_host():
    """The one-program all-classes device NMS == the per-class host loop
    (reference fcaf3d_head.py:768-838 semantics)."""
    from proxytransformation_tpu.ops.nms3d import multiclass_nms
    from proxytransformation_tpu.models.fcaf3d_head import (
        multiclass_nms_host)
    rng = np.random.RandomState(3)
    N, C = 64, 7
    centers = rng.uniform(0, 4, (N, 3))
    dims = rng.uniform(0.5, 1.5, (N, 3))
    angles = rng.uniform(-np.pi, np.pi, (N, 3))
    boxes = np.concatenate([centers, dims, angles], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (N, C)).astype(np.float32)
    mask = rng.rand(N) > 0.2

    db, ds, dl, dv = (np.asarray(a) for a in multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(mask),
        score_thr=0.3, iou_thr=0.4, nms_pre=48, max_out=512))
    hb, hs, hl = multiclass_nms_host(boxes, scores, mask, score_thr=0.3,
                                     iou_thr=0.4, nms_pre=48)
    # same kept set (order: device output is score-sorted)
    order = np.argsort(-hs, kind='stable')
    hb, hs, hl = hb[order], hs[order], hl[order]
    n = int(dv.sum())
    assert n == len(hs)
    np.testing.assert_allclose(ds[:n], hs, rtol=1e-6)
    # labels may tie-break differently only on exactly equal scores
    same = ds[:n] == hs
    np.testing.assert_array_equal(dl[:n][same], hl[same])
    np.testing.assert_allclose(db[:n][same], hb[same], rtol=1e-6)
