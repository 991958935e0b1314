import numpy as np
import jax
import jax.numpy as jnp
import pytest

from proxytransformation_tpu.ops.sparse import (
    SparseLevel, voxelize_points, downsample_coords, build_neighbor_map,
    sparse_conv_apply, sparse_max_pool, generative_transpose_map,
    generative_transpose_apply, prune_topk, linearize, kernel_offsets,
    SENTINEL)


def _make_level(coords, feats, extent=(16, 16, 16), stride=1, capacity=None):
    """Build a valid SparseLevel from unique int coords (single sample)."""
    coords = np.asarray(coords, np.int32)
    V = capacity or len(coords)
    keys = np.asarray(linearize(jnp.asarray(coords), extent))
    order = np.argsort(keys)
    keys, coords = keys[order], coords[order]
    feats = np.asarray(feats, np.float32)[order]
    pad = V - len(coords)
    keys = np.concatenate([keys, np.full(pad, 2**31 - 1, np.int64)])
    coords = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
    feats = np.concatenate([feats, np.zeros((pad, feats.shape[1]),
                                            np.float32)])
    mask = np.arange(V) < V - pad
    return SparseLevel(jnp.asarray(keys[None].astype(np.int32)),
                       jnp.asarray(coords[None]), jnp.asarray(feats[None]),
                       jnp.asarray(mask[None]),
                       jnp.zeros((1, 3)), extent, stride, 1.0)


def test_voxelize_dedup_first():
    pts = np.array([[[0.0, 0.0, 0.0], [0.004, 0.0, 0.0],  # same 1cm voxel
                     [0.02, 0.0, 0.0], [0.05, 0.03, 0.01]]], np.float32)
    feats = np.arange(4, dtype=np.float32).reshape(1, 4, 1)
    mask = np.ones((1, 4), bool)
    lvl = voxelize_points(jnp.asarray(pts), jnp.asarray(mask),
                          jnp.asarray(feats), voxel_size=0.01, capacity=8)
    assert int(lvl.mask.sum()) == 3
    # first point of each voxel wins (deterministic subsample)
    got = sorted(np.asarray(lvl.feats[0][np.asarray(lvl.mask[0])]).ravel())
    assert got == [0.0, 2.0, 3.0]
    # keys sorted ascending with sentinel padding
    keys = np.asarray(lvl.keys[0])
    assert np.all(np.diff(keys.astype(np.int64)) >= 0)


def test_voxelize_world_xyz_roundtrip():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-3, 3, (2, 100, 3)).astype(np.float32)
    mask = np.ones((2, 100), bool)
    lvl = voxelize_points(jnp.asarray(pts), jnp.asarray(mask),
                          jnp.asarray(pts), voxel_size=0.05, capacity=128)
    xyz = np.asarray(lvl.world_xyz())
    m = np.asarray(lvl.mask)
    # voxel corners must be within voxel_size of some original point
    for b in range(2):
        for v in np.nonzero(m[b])[0]:
            d = np.linalg.norm(pts[b] - xyz[b, v], axis=-1).min()
            assert d < 0.05 * np.sqrt(3) + 1e-6


def _dense_from_level(lvl, shape):
    dense = np.zeros((1, ) + shape + (lvl.feats.shape[-1], ), np.float32)
    c = np.asarray(lvl.coords[0])
    f = np.asarray(lvl.feats[0])
    m = np.asarray(lvl.mask[0])
    for i in np.nonzero(m)[0]:
        dense[0, c[i, 0], c[i, 1], c[i, 2]] = f[i]
    return dense


def test_sparse_conv_matches_dense_stride1():
    rng = np.random.RandomState(1)
    n, cin, cout = 40, 4, 6
    coords = rng.choice(12, (200, 3)).astype(np.int32)
    coords = np.unique(coords, axis=0)[:n]
    feats = rng.randn(len(coords), cin).astype(np.float32)
    lvl = _make_level(coords, feats, capacity=64)
    nbr = build_neighbor_map(lvl, lvl, kernel_size=3, stride=1)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.2
    out = np.asarray(sparse_conv_apply(lvl.feats, nbr, jnp.asarray(w),
                                       lvl.mask))[0]
    # dense oracle
    dense = _dense_from_level(lvl, (16, 16, 16))
    dn = jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(w.reshape(3, 3, 3, cin, cout)),
        window_strides=(1, 1, 1), padding='SAME',
        dimension_numbers=('NHWDC', 'HWDIO', 'NHWDC'),
        precision='highest')
    dn = np.asarray(dn)[0]
    c = np.asarray(lvl.coords[0])
    m = np.asarray(lvl.mask[0])
    for i in np.nonzero(m)[0]:
        np.testing.assert_allclose(out[i], dn[c[i, 0], c[i, 1], c[i, 2]],
                                   rtol=1e-4, atol=1e-4)


def test_sparse_conv_matches_dense_stride2():
    rng = np.random.RandomState(2)
    cin, cout = 3, 5
    coords = np.unique(rng.choice(12, (150, 3)).astype(np.int32), axis=0)
    feats = rng.randn(len(coords), cin).astype(np.float32)
    lvl = _make_level(coords, feats, capacity=200)
    out_lvl = downsample_coords(lvl, capacity=128)
    nbr = build_neighbor_map(lvl, out_lvl, kernel_size=3, stride=2)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.2
    out = np.asarray(sparse_conv_apply(lvl.feats, nbr, jnp.asarray(w),
                                       out_lvl.mask))[0]
    dense = _dense_from_level(lvl, (16, 16, 16))
    dn = jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(w.reshape(3, 3, 3, cin, cout)),
        window_strides=(2, 2, 2), padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=('NHWDC', 'HWDIO', 'NHWDC'), precision='highest')
    dn = np.asarray(dn)[0]
    oc = np.asarray(out_lvl.coords[0])
    om = np.asarray(out_lvl.mask[0])
    assert om.sum() > 0
    for i in np.nonzero(om)[0]:
        np.testing.assert_allclose(out[i], dn[oc[i, 0], oc[i, 1], oc[i, 2]],
                                   rtol=1e-4, atol=1e-4)
    # output coords are exactly the distinct parents
    parents = np.unique(np.asarray(lvl.coords[0])[np.asarray(lvl.mask[0])]
                        // 2, axis=0)
    got = np.asarray(sorted(map(tuple, oc[om])))
    np.testing.assert_array_equal(got, parents)


def test_max_pool_matches_oracle():
    rng = np.random.RandomState(3)
    coords = np.unique(rng.choice(8, (60, 3)).astype(np.int32), axis=0)
    feats = rng.randn(len(coords), 4).astype(np.float32)
    lvl = _make_level(coords, feats, extent=(8, 8, 8), capacity=80)
    out_lvl = downsample_coords(lvl, capacity=64)
    nbr = build_neighbor_map(lvl, out_lvl, kernel_size=2, stride=2)
    out = np.asarray(sparse_max_pool(lvl.feats, nbr, out_lvl.mask))[0]
    om = np.asarray(out_lvl.mask[0])
    oc = np.asarray(out_lvl.coords[0])
    cd = {tuple(c): f for c, f in zip(map(tuple, coords), feats)}
    for i in np.nonzero(om)[0]:
        kids = [cd[tuple(oc[i] * 2 + d)] for d in kernel_offsets(2)
                if tuple(oc[i] * 2 + d) in cd]
        want = np.max(np.stack(kids), axis=0)
        np.testing.assert_allclose(out[i], want, rtol=1e-5)


def test_generative_transpose():
    rng = np.random.RandomState(4)
    coarse_coords = np.unique(rng.choice(4, (20, 3)).astype(np.int32),
                              axis=0)
    cf = rng.randn(len(coarse_coords), 4).astype(np.float32)
    coarse = _make_level(coarse_coords, cf, extent=(8, 8, 8), stride=2,
                         capacity=32)
    # fine = all children of coarse
    fine_coords = (coarse_coords[:, None, :] * 2
                   + kernel_offsets(2)[None]).reshape(-1, 3)
    fine_coords = np.unique(fine_coords, axis=0)
    fine = _make_level(fine_coords, np.zeros((len(fine_coords), 1)),
                       extent=(16, 16, 16), stride=1,
                       capacity=len(fine_coords) + 8)
    pidx, oid = generative_transpose_map(fine, coarse)
    w = rng.randn(8, 4, 3).astype(np.float32)
    out = np.asarray(generative_transpose_apply(coarse.feats, pidx, oid,
                                                jnp.asarray(w), fine.mask))[0]
    fc = np.asarray(fine.coords[0])
    fm = np.asarray(fine.mask[0])
    cdict = {tuple(c): f for c, f in zip(map(tuple, coarse_coords), cf)}
    for i in np.nonzero(fm)[0]:
        p = tuple(fc[i] // 2)
        o = fc[i] - np.asarray(p) * 2
        o_id = (o[0] * 2 + o[1]) * 2 + o[2]
        want = cdict[p] @ w[o_id]
        np.testing.assert_allclose(out[i], want, rtol=1e-4, atol=1e-5)


def test_prune_topk():
    coords = np.array([[i, 0, 0] for i in range(10)], np.int32)
    feats = np.ones((10, 2), np.float32)
    lvl = _make_level(coords, feats, capacity=12)
    scores = jnp.asarray(np.arange(12, dtype=np.float32)[None])
    pruned = prune_topk(lvl, scores, k=3)
    m = np.asarray(pruned.mask[0])
    assert m.sum() == 3
    assert set(np.nonzero(m)[0]) == {7, 8, 9}  # highest valid scores
    # features zeroed at pruned slots
    assert np.all(np.asarray(pruned.feats[0])[~m] == 0)


def test_compact_topk_matches_prune_topk():
    """compact_topk keeps exactly prune_topk's survivor set, compacted
    in key order, with extras gathered alongside."""
    from proxytransformation_tpu.ops.sparse import compact_topk
    rng = np.random.RandomState(3)
    coords = rng.permutation(np.stack(np.meshgrid(
        np.arange(4), np.arange(4), np.arange(4),
        indexing='ij'), -1).reshape(-1, 3))[:40]
    feats = rng.randn(40, 3).astype(np.float32)
    lvl = _make_level(coords, feats, capacity=48)
    scores = jnp.asarray(rng.randn(1, 48).astype(np.float32))
    k = 7
    pruned = prune_topk(lvl, scores, k)
    compacted, (extra_s, ), src = compact_topk(lvl, scores, k,
                                               extras=(scores, ))
    # same survivor keys, key order preserved, static capacity k
    want_keys = np.asarray(lvl.keys[0])[np.asarray(pruned.mask[0])]
    got_m = np.asarray(compacted.mask[0])
    assert compacted.keys.shape == (1, k)
    np.testing.assert_array_equal(np.asarray(compacted.keys[0])[got_m],
                                  want_keys)
    assert np.all(np.diff(np.asarray(compacted.keys[0])[got_m]) > 0)
    # feats/coords/extras follow the same rows
    srcv = np.asarray(src[0])[got_m]
    np.testing.assert_array_equal(np.asarray(compacted.feats[0])[got_m],
                                  np.asarray(lvl.feats[0])[srcv])
    np.testing.assert_array_equal(np.asarray(compacted.coords[0])[got_m],
                                  np.asarray(lvl.coords[0])[srcv])
    np.testing.assert_array_equal(np.asarray(extra_s[0])[got_m],
                                  np.asarray(scores[0])[srcv])
    # padding rows are inert: mask False, sentinel keys, zero feats
    assert np.all(np.asarray(compacted.keys[0])[~got_m] == 2**31 - 1)
    assert np.all(np.asarray(compacted.feats[0])[~got_m] == 0)


def test_compact_topk_capacity_at_least_valid():
    """capacity >= valid rows: everything survives, still key-sorted."""
    from proxytransformation_tpu.ops.sparse import compact_topk
    coords = np.array([[i, 0, 0] for i in range(5)], np.int32)
    feats = np.arange(10, dtype=np.float32).reshape(5, 2)
    lvl = _make_level(coords, feats, capacity=9)
    scores = jnp.asarray(np.arange(9, dtype=np.float32)[None])
    compacted, _, _ = compact_topk(lvl, scores, 8)
    m = np.asarray(compacted.mask[0])
    assert m.sum() == 5
    np.testing.assert_array_equal(np.asarray(compacted.feats[0])[m],
                                  np.asarray(lvl.feats[0])[:5])
