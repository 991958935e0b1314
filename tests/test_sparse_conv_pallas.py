"""Pallas monotone-window sparse conv vs the XLA oracle.

The kernel requires per-offset monotone indices (guaranteed by
ops.sparse.build_neighbor_map since keys are sorted and offsets are
constant key shifts); tests use sorted synthetic maps plus a real
build_neighbor_map product.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proxytransformation_tpu.ops.sparse import (
    SparseLevel, build_neighbor_map, sparse_conv_apply, voxelize_points,
    _sparse_conv_pallas_bwd)
from proxytransformation_tpu.ops.sparse_conv_pallas import (
    sparse_conv_gather_gemm)


def _synthetic(rng, B, Vi, Vo, Ci, Co, K3, miss=0.4):
    feats = jnp.asarray(rng.randn(B, Vi, Ci).astype(np.float32))
    nbr = np.sort(rng.randint(0, Vi, (B, Vo, K3)), axis=1).astype(np.int32)
    nbr = np.where(rng.rand(B, Vo, K3) < miss, -1, nbr)
    w = jnp.asarray(rng.randn(K3, Ci, Co).astype(np.float32) * 0.1)
    mask = jnp.asarray(rng.rand(B, Vo) < 0.9)
    return feats, jnp.asarray(nbr), w, mask


def _oracle(feats, nbr, w, mask):
    # the kernel's only rounding is the input f32->bf16 cast
    return sparse_conv_apply(
        feats.astype(jnp.bfloat16).astype(jnp.float32), nbr,
        w.astype(jnp.bfloat16).astype(jnp.float32), mask)


@pytest.mark.parametrize('Ci,Co,K3', [(3, 7, 27), (16, 150, 27),
                                      (64, 64, 8), (40, 30, 1),
                                      (300, 520, 27)])
def test_kernel_matches_oracle(Ci, Co, K3):
    rng = np.random.RandomState(Ci + Co)
    feats, nbr, w, mask = _synthetic(rng, 2, 700, 300, Ci, Co, K3)
    ref = _oracle(feats, nbr, w, mask)
    got = sparse_conv_gather_gemm(feats, nbr, w, mask, interpret=True)
    scale = max(1e-9, float(jnp.max(jnp.abs(ref))))
    assert float(jnp.max(jnp.abs(ref - got))) / scale < 2e-2


def test_kernel_on_real_neighbor_map():
    rng = np.random.RandomState(0)
    B, N = 2, 1500
    pts = jnp.asarray(rng.uniform(0, 2.0, (B, N, 3)).astype(np.float32))
    pmask = jnp.asarray(rng.rand(B, N) < 0.95)
    lvl = voxelize_points(pts, pmask, pts, voxel_size=0.05, capacity=1024,
                          extent=(64, 64, 64))
    nbr = build_neighbor_map(lvl, lvl, kernel_size=3, stride=1)
    w = jnp.asarray(rng.randn(27, 3, 16).astype(np.float32) * 0.1)
    ref = _oracle(lvl.feats, nbr, w, lvl.mask)
    got = sparse_conv_gather_gemm(lvl.feats, nbr, w, lvl.mask,
                                  interpret=True)
    scale = max(1e-9, float(jnp.max(jnp.abs(ref))))
    assert float(jnp.max(jnp.abs(ref - got))) / scale < 2e-2


@pytest.mark.parametrize('self_map', [True, False])
def test_custom_vjp_backward_matches_xla_grads(self_map):
    """The all-Pallas backward (dW gather-GEMM + dfeats via mirrored /
    reversed map) vs jax.grad of the XLA conv, on REAL maps from
    build_neighbor_map (the reversed-map inversion needs the real maps'
    per-offset injectivity; the mirrored trick needs self-map key
    symmetry — synthetic random maps have neither)."""
    rng = np.random.RandomState(1)
    B, N, C_in, C_out = 2, 900, 8, 12
    pts = jnp.asarray(rng.uniform(0, 2.5, (B, N, 3)).astype(np.float32))
    pmask = jnp.asarray(rng.rand(B, N) < 0.95)
    lvl = voxelize_points(pts, pmask, pts, voxel_size=0.05, capacity=640,
                          extent=(64, 64, 64))
    f0 = jnp.where(lvl.mask[..., None],
                   jnp.asarray(rng.randn(B, 640, C_in), jnp.float32), 0.0)
    if self_map:
        out_lvl, stride = lvl, 1
    else:
        from proxytransformation_tpu.ops.sparse import downsample_coords
        out_lvl, stride = downsample_coords(lvl, 320), 2
    nbr = build_neighbor_map(lvl, out_lvl, kernel_size=3, stride=stride)
    mask = out_lvl.mask
    w = jnp.asarray(rng.randn(27, C_in, C_out).astype(np.float32) * 0.1)

    def loss_ref(f, wt):
        out = sparse_conv_apply(f, nbr, wt, mask)
        return jnp.sum(out ** 2)

    df_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(f0, w)

    out = sparse_conv_apply(f0, nbr, w, mask)
    g = 2.0 * out
    df, _, dw, _ = _sparse_conv_pallas_bwd(self_map, (f0, nbr, w, mask),
                                           g)
    scale = max(1e-9, float(jnp.max(jnp.abs(df_ref))))
    assert float(jnp.max(jnp.abs(df - df_ref))) / scale < 2e-2
    scale = max(1e-9, float(jnp.max(jnp.abs(dw_ref))))
    assert float(jnp.max(jnp.abs(dw - dw_ref))) / scale < 2e-2


def test_reversed_weight_backward_formula():
    """The self-map dfeats formula (same map, mirrored-transposed
    weights) matches autodiff of the XLA conv — interpret mode."""
    import jax
    from proxytransformation_tpu.ops.sparse import (voxelize_points,
        build_neighbor_map, sparse_conv_apply)
    rng = np.random.RandomState(7)
    B, V, C_in, C_out = 2, 300, 8, 12
    pts = jnp.asarray(rng.uniform(0, 3.0, (B, V, 3)).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, V) > 0.1)
    lvl = voxelize_points(pts, mask, pts, voxel_size=0.2, capacity=V,
                          extent=(16, 16, 16))
    nbr = build_neighbor_map(lvl, lvl, 3, 1)
    f0 = jnp.where(lvl.mask[..., None],
                   jnp.asarray(rng.randn(B, V, C_in), jnp.float32), 0.0)
    w = jnp.asarray(rng.randn(27, C_in, C_out).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.randn(B, V, C_out).astype(np.float32))
    cot = jnp.where(lvl.mask[..., None], cot, 0.0)

    ref_df = jax.grad(
        lambda f: jnp.sum(sparse_conv_apply(f, nbr, w, lvl.mask) * cot))(
            f0)
    w_rev = jnp.swapaxes(w, 1, 2)[::-1]
    got_df = sparse_conv_gather_gemm(cot, nbr, w_rev, lvl.mask,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got_df), np.asarray(ref_df),
                               atol=2e-2, rtol=2e-2)
