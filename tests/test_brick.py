"""Brick-format engine (ops/brick.py): exact equivalence to the cell
format — pack/unpack bijection, brick conv == cell conv (fwd + grads),
and the full backbone with brick stages matching the cell backbone."""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from proxytransformation_tpu.ops.brick import (  # noqa: E402
    brick_expand, brick_pack, brick_unpack, build_brick_level)
from proxytransformation_tpu.ops.sparse import (  # noqa: E402
    build_neighbor_map, sparse_conv_apply, voxelize_points)


def _toy_level(seed=0, B=2, n=400, cap=256, C=8):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(0, 0.14, (B, n, 3)).astype(np.float32)
    mask = np.ones((B, n), bool)
    mask[1, n // 2:] = False  # ragged batch
    lvl = voxelize_points(jnp.asarray(pts), jnp.asarray(mask),
                          jnp.asarray(pts), voxel_size=0.01, capacity=cap,
                          extent=(16, 16, 16))
    feats = rng.randn(B, cap, C).astype(np.float32)
    feats = jnp.where(lvl.mask[..., None], jnp.asarray(feats), 0.0)
    return lvl._replace(feats=feats), feats


def test_pack_unpack_roundtrip_exact():
    lvl, feats = _toy_level()
    blvl, pmap, unb8, slot_mask = build_brick_level(lvl, 200)
    bf = brick_pack(feats, pmap, unb8, blvl.mask, lvl.mask)
    assert bf.shape == (2, 200, 8 * feats.shape[-1])
    # every valid cell appears in exactly one slot
    n_cells = int(lvl.mask.sum())
    assert int(slot_mask.sum()) == n_cells
    back = brick_unpack(bf, pmap, unb8, blvl.mask, lvl.mask)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(feats))
    # brick coords are the cell coords // 2 set (and sorted-key valid)
    ref = np.unique(np.asarray(lvl.coords[0][np.asarray(lvl.mask[0])])
                    // 2, axis=0)
    got = np.asarray(blvl.coords[0][np.asarray(blvl.mask[0])])
    np.testing.assert_array_equal(np.sort(got, 0), np.sort(ref, 0))


def test_brick_conv_matches_cell_conv():
    lvl, feats = _toy_level(seed=1)
    C = feats.shape[-1]
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) / 10)

    nbr = build_neighbor_map(lvl, lvl, 3, 1)
    out_cell = sparse_conv_apply(feats, nbr, w, lvl.mask)

    blvl, pmap, unb8, slot_mask = build_brick_level(lvl, 200)
    bnbr = build_neighbor_map(blvl, blvl, 3, 1)
    bf = brick_pack(feats, pmap, unb8, blvl.mask, lvl.mask)
    bout = sparse_conv_apply(bf, bnbr, brick_expand(w), blvl.mask)
    out_brick = brick_unpack(bout, pmap, unb8, blvl.mask, lvl.mask)

    np.testing.assert_allclose(np.asarray(out_brick), np.asarray(out_cell),
                               rtol=1e-5, atol=1e-5)


def test_brick_conv_gradients_match_cell():
    lvl, feats = _toy_level(seed=3, C=4)
    C = 4
    rng = np.random.RandomState(4)
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) / 10)
    cot = jnp.asarray(rng.randn(*feats.shape).astype(np.float32))
    cot = jnp.where(lvl.mask[..., None], cot, 0.0)

    nbr = build_neighbor_map(lvl, lvl, 3, 1)
    blvl, pmap, unb8, slot_mask = build_brick_level(lvl, 200)
    bnbr = build_neighbor_map(blvl, blvl, 3, 1)

    def loss_cell(f, ww):
        return jnp.sum(sparse_conv_apply(f, nbr, ww, lvl.mask) * cot)

    def loss_brick(f, ww):
        bf = brick_pack(f, pmap, unb8, blvl.mask, lvl.mask)
        bout = sparse_conv_apply(bf, bnbr, brick_expand(ww), blvl.mask)
        return jnp.sum(
            brick_unpack(bout, pmap, unb8, blvl.mask, lvl.mask) * cot)

    gf_c, gw_c = jax.grad(loss_cell, argnums=(0, 1))(feats, w)
    gf_b, gw_b = jax.grad(loss_brick, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf_b), np.asarray(gf_c),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_c),
                               rtol=1e-4, atol=1e-5)


def test_backbone_brick_stages_match_cell_stages():
    """MinkResNet with brick_stages on vs off: identical param trees
    (same names/shapes -> same init from the same rng) and matching
    outputs at every stage, train and eval."""
    from proxytransformation_tpu.models.sparse_resnet import MinkResNet

    rng = np.random.RandomState(5)
    B, n = 2, 2000
    pts = rng.uniform(0, 0.6, (B, n, 3)).astype(np.float32)
    mask = np.ones((B, n), bool)
    mask[1, 1500:] = False
    caps = (2048, 2048, 1024, 512, 256, 128)
    lvl0 = voxelize_points(jnp.asarray(pts), jnp.asarray(mask),
                           jnp.asarray(pts), voxel_size=0.01,
                           capacity=caps[0], extent=(64, 64, 64))

    kw = dict(depth=14, capacities=caps)
    m_cell = MinkResNet(brick_stages=(), **kw)
    m_brick = MinkResNet(brick_stages=(0, 1), **kw)
    v = m_cell.init(jax.random.PRNGKey(0), lvl0, train=False)
    v2 = m_brick.init(jax.random.PRNGKey(0), lvl0, train=False)
    flat = jax.tree_util.tree_leaves_with_path(v['params'])
    flat2 = jax.tree_util.tree_leaves_with_path(v2['params'])
    assert [(jax.tree_util.keystr(k), x.shape) for k, x in flat] \
        == [(jax.tree_util.keystr(k), x.shape) for k, x in flat2]

    outs_c = m_cell.apply(v, lvl0, train=False)
    outs_b = m_brick.apply(v, lvl0, train=False)
    assert len(outs_c) == len(outs_b) == 4
    # summation-order drift compounds through 8+ norm divisions; the
    # per-conv exactness bound lives in test_brick_conv_matches_cell_conv
    for lc, lb in zip(outs_c, outs_b):
        np.testing.assert_allclose(np.asarray(lb.feats),
                                   np.asarray(lc.feats),
                                   rtol=1e-3, atol=1e-3)

    # train mode: batch-stats mutation must match too (the brick norm
    # sees the same valid (cell, channel) population)
    oc, mc = m_cell.apply(v, lvl0, train=True, mutable=['batch_stats'])
    ob, mb = m_brick.apply(v, lvl0, train=True, mutable=['batch_stats'])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-3),
        mc['batch_stats'], mb['batch_stats'])
    for lc, lb in zip(oc, ob):
        np.testing.assert_allclose(np.asarray(lb.feats),
                                   np.asarray(lc.feats),
                                   rtol=1e-3, atol=1e-3)

    # self maps: brick stages return None, others real maps
    (_, sm_b) = m_brick.apply(v, lvl0, train=False, return_self_maps=True)
    assert sm_b[0] is None and sm_b[1] is None
    assert sm_b[2] is not None and sm_b[3] is not None


def test_backbone_brick_gradients_match_cell():
    from proxytransformation_tpu.models.sparse_resnet import MinkResNet

    rng = np.random.RandomState(6)
    B, n = 1, 800
    pts = rng.uniform(0, 0.3, (B, n, 3)).astype(np.float32)
    mask = np.ones((B, n), bool)
    caps = (1024, 1024, 512, 256, 128, 64)
    lvl0 = voxelize_points(jnp.asarray(pts), jnp.asarray(mask),
                           jnp.asarray(pts), voxel_size=0.01,
                           capacity=caps[0], extent=(32, 32, 32))

    kw = dict(depth=14, capacities=caps, num_stages=2)
    m_cell = MinkResNet(brick_stages=(), **kw)
    m_brick = MinkResNet(brick_stages=(0, 1), **kw)
    v = m_cell.init(jax.random.PRNGKey(1), lvl0, train=False)

    def loss(model, params):
        outs = model.apply({'params': params,
                            'batch_stats': v['batch_stats']},
                           lvl0, train=False)
        return sum(jnp.sum(jnp.abs(o.feats)) for o in outs)

    g_c = jax.grad(lambda p: loss(m_cell, p))(v['params'])
    g_b = jax.grad(lambda p: loss(m_brick, p))(v['params'])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4),
        g_c, g_b)


if __name__ == '__main__':
    sys.exit(pytest.main([__file__, '-q']))
