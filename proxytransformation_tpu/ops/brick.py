"""2x2x2 brick format for the sparse voxel engine.

A brick level groups each 2-cell-cube of an existing SparseLevel into
one row holding all 8 sub-cell feature blocks: feats (B, Vb, 8*C) with
block s = ((x%2)*2 + y%2)*2 + z%2 (z fastest — kernel_offsets(2)
order). The brick coordinate set IS `downsample_coords` of the cell
level, so all sorted-key machinery (maps, merge-join, conv kernels)
applies unchanged at brick granularity.

Measured outcome (tools/brick_analysis.py + tools/profile_brick.py ->
BRICK_ANALYSIS.json): the format is kept as exact, tested
infrastructure but is OFF by default — it loses integrated on the
v5e. The hypothesis was that the cell conv is gather-bound (one-hot
row picks dominate the C*C matmuls at C<=128) so running the 3^3 conv
at brick granularity — 27 offsets of (8C x 8C) block-structured
matmuls on ~4x fewer rows — trades 8x raw FLOPs for MXU-wide matmuls;
the isolated 512-wide conv indeed wins 29% (4.27 vs 5.97 ms at s1
shapes). Integrated it inverts: the full backbone forward measures
113.4 ms cell vs 119.8 ms brick-stage-0 vs 153.7 ms brick-stage-1
(surface scene, B=2). Stage 0's level holds only 1.83 cells/brick
(maps shrink 1.8x, not 4x, against the 8x FLOP expansion); stage 1's
8C=1024 expanded weights are matmul-FLOP-bound (~16x useful FLOPs);
and exploiting the static 216/1728 block sparsity would serialize 216
one-hot/dot steps against the cell kernel's 27.

Semantics are EXACT (up to f32 summation order): a brick conv with
`brick_expand`-ed weights computes precisely the cell conv — missing
cells are zero blocks (= map misses), outputs at missing sub-cells are
discarded by the masked norms / unpack.

Equivalent of ME's kernel-map + conv at these levels (reference
embodiedscan/models/backbones/mink_resnet.py:58-124); the brick layout
itself has no reference analog — it is the TPU-native data layout.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import (SparseLevel, build_neighbor_map, downsample_coords,
                     kernel_offsets, sparse_conv)


def build_brick_level(level: SparseLevel, capacity: int
                      ) -> Tuple[SparseLevel, jnp.ndarray, jnp.ndarray,
                                 jnp.ndarray]:
    """Brick grouping of `level`.

    Returns:
        blvl: SparseLevel of brick coords (feats placeholder), sorted
            keys — structurally identical to a coarser level.
        pmap: (B, Vb, 8) int32 — cell index of each brick sub-slot
            (-1 = that sub-cell does not exist). Slot order matches
            kernel_offsets(2): s = ((dx*2)+dy)*2+dz.
        unb8: (B, V, 8) int32 — inverse map: unb8[v, s] = brick row of
            cell v if slot(v) == s else -1 (the 8-offset form the
            selection convs consume).
        slot_mask: (B, Vb, 8) bool — which sub-cells exist.
    """
    blvl = downsample_coords(level, capacity)
    pmap = build_neighbor_map(level, blvl, kernel_size=2, stride=2)
    slot_mask = pmap >= 0

    B, Vb, _ = pmap.shape
    V = level.mask.shape[1]
    safe = jnp.where(slot_mask, pmap, V)     # dropped by mode='drop'
    vb_ids = jnp.broadcast_to(
        jnp.arange(Vb, dtype=jnp.int32)[None, :, None], pmap.shape)
    b_ids = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None, None], pmap.shape)
    s_ids = jnp.broadcast_to(
        jnp.arange(8, dtype=jnp.int32)[None, None, :], pmap.shape)
    unb8 = jnp.full((B, V, 8), -1, jnp.int32)
    unb8 = unb8.at[b_ids, safe, s_ids].set(vb_ids, mode='drop')
    return blvl, pmap, unb8, slot_mask


@functools.lru_cache(maxsize=None)
def _pack_weights(c: int) -> np.ndarray:
    """(8, C, 8C) selection blocks: slot s writes channel block s."""
    w = np.zeros((8, c, 8 * c), np.float32)
    eye = np.eye(c, dtype=np.float32)
    for s in range(8):
        w[s, :, s * c:(s + 1) * c] = eye
    return w


@functools.lru_cache(maxsize=None)
def _unpack_weights(c: int) -> np.ndarray:
    """(8, 8C, C) selection blocks: slot s reads channel block s."""
    w = np.zeros((8, 8 * c, c), np.float32)
    eye = np.eye(c, dtype=np.float32)
    for s in range(8):
        w[s, s * c:(s + 1) * c, :] = eye
    return w


def _pack_impl(feats, pmap, brick_mask):
    c = feats.shape[-1]
    return sparse_conv(feats, pmap, jnp.asarray(_pack_weights(c)),
                       brick_mask)


def _unpack_impl(bfeats, unb8, cell_mask):
    c = bfeats.shape[-1] // 8
    return sparse_conv(bfeats, unb8, jnp.asarray(_unpack_weights(c)),
                       cell_mask)


@jax.custom_vjp
def brick_pack(feats: jnp.ndarray, pmap: jnp.ndarray, unb8: jnp.ndarray,
               brick_mask: jnp.ndarray, cell_mask: jnp.ndarray
               ) -> jnp.ndarray:
    """(B, V, C) cell feats -> (B, Vb, 8C) brick feats (0 at missing
    sub-cells). Pack and unpack are mutually inverse bijections between
    valid cells and valid slots, so each is the other's exact vjp — no
    dW pass, no scatter in the backward."""
    return _pack_impl(feats, pmap, brick_mask)


def _pack_fwd(feats, pmap, unb8, brick_mask, cell_mask):
    return _pack_impl(feats, pmap, brick_mask), (unb8, cell_mask)


def _pack_bwd(res, g):
    # the conv impls preserve dtype, so g's dtype is the primal's
    unb8, cell_mask = res
    return _unpack_impl(g, unb8, cell_mask), None, None, None, None


brick_pack.defvjp(_pack_fwd, _pack_bwd)


@jax.custom_vjp
def brick_unpack(bfeats: jnp.ndarray, pmap: jnp.ndarray,
                 unb8: jnp.ndarray, brick_mask: jnp.ndarray,
                 cell_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, Vb, 8C) brick feats -> (B, V, C) cell feats."""
    return _unpack_impl(bfeats, unb8, cell_mask)


def _unpack_fwd(bfeats, pmap, unb8, brick_mask, cell_mask):
    return _unpack_impl(bfeats, unb8, cell_mask), (pmap, brick_mask)


def _unpack_bwd(res, g):
    pmap, brick_mask = res
    return _pack_impl(g, pmap, brick_mask), None, None, None, None


brick_unpack.defvjp(_unpack_fwd, _unpack_bwd)


@functools.lru_cache(maxsize=None)
def _brick_mix() -> np.ndarray:
    """(27_bo, 8_sp, 8_sq, 27_d) 0/1: brick-offset block (bo, sp, sq)
    applies cell-offset weight d iff 2*off(bo) + sub(sp) - sub(sq) is a
    [-1,1]^3 cell offset. 216 of 1728 blocks are nonzero — the exact 8x
    matmul-FLOP padding the MXU eats for breakfast at C<=128."""
    offs = kernel_offsets(3)     # (27, 3), z fastest, [-1, 1]
    subs = kernel_offsets(2)     # (8, 3), z fastest, [0, 1]
    m = np.zeros((27, 8, 8, 27), np.float32)
    for bo in range(27):
        for sp in range(8):
            for sq in range(8):
                d = 2 * offs[bo] + subs[sp] - subs[sq]
                if np.all(np.abs(d) <= 1):
                    di = int((d[0] + 1) * 9 + (d[1] + 1) * 3 + (d[2] + 1))
                    m[bo, sp, sq, di] = 1.0
    return m


def brick_expand(w: jnp.ndarray) -> jnp.ndarray:
    """Learnable cell weights (27, C_in, C_out) -> brick weights
    (27, 8*C_in, 8*C_out). Differentiable (a static 0/1 einsum), so the
    parameter stays the reference-shaped cell stencil — checkpoints and
    the torch converter are format-agnostic."""
    k3, c_in, c_out = w.shape
    assert k3 == 27, 'brick format covers 3^3 kernels'
    mix = jnp.asarray(_brick_mix())
    wb = jnp.einsum('bpqd,dio->bpiqo', mix, w,
                    preferred_element_type=w.dtype)
    return wb.reshape(27, 8 * c_in, 8 * c_out)
