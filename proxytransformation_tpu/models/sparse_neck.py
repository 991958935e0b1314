"""Sparse FPN neck with score-based voxel pruning (MinkNeck), TPU-native.

Re-design of the reference `MinkNeck` (reference:
embodiedscan/models/necks/mink_neck.py:20-245): top-down FPN over the
four sparse backbone levels with a generative transpose-conv up path,
per-level 1-class scoring, and pruning to `pts_prune_threshold` voxels
per sample per level (reference :163-186). The fp32 autocast guard of
the reference (:150-151) is inherent here — pruning math runs in fp32.

Pruning is PHYSICAL, like ME's MinkowskiPruning: survivors are
compacted into small static-capacity levels (`ops.sparse.compact_topk`)
instead of masked in place, so the up/out convolutions, norms and the
2D→3D painting run on ~P rows per level instead of the full backbone
capacity (50k at level 0 — a ~12-50× FLOP cut that mirrors what the
reference gets for free from ME's dynamic tensors). Two-stage support:
the up block runs on the top-`4·P` voxels by parent score (the analog
of ME's children-of-survivors generative support), the out block on the
final top-`P`. Painting is injected per level via `paint_fn` and runs
AFTER compaction — painting is pointwise per voxel, so compaction
commutes with it exactly.

Static-shape output: each level is compacted to exactly
`pts_prune_threshold` rows by score, and the levels are concatenated
into (B, 4·P, C) + validity mask (the padded-static equivalent of the
reference's per-sample lists, mink_neck.py:216-245).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.sparse import (SparseLevel, build_neighbor_map, compact_topk,
                          generative_transpose_apply,
                          generative_transpose_map, linearize,
                          lookup_center, SENTINEL)
from ..utils.registry import MODELS
from .norms import MaskedBatchNorm
from .sparse_resnet import SparseConv

_PRIOR_BIAS = float(-np.log((1 - 0.01) / 0.01))  # bias_init_with_prob(.01)

# paint_fn(world_xyz (B, Vc, 3), mask (B, Vc), level_idx) -> (B, Vc, C_img)
PaintFn = Callable[[jnp.ndarray, jnp.ndarray, int], jnp.ndarray]


class _UpBlock(nn.Module):
    """GenerativeTranspose(k2 s2) + BN + ELU + conv3 + BN + ELU
    (reference mink_neck.py:79-100), evaluated at the (compacted)
    skip level's coordinate set."""
    out_channels: int

    @nn.compact
    def __call__(self, coarse_feats, parent_idx, offset_id, fine_nbr,
                 fine_mask, train: bool = False):
        w = self.param(
            'transpose_kernel',
            nn.initializers.variance_scaling(2.0, 'fan_out',
                                             'truncated_normal'),
            (8, coarse_feats.shape[-1], self.out_channels))
        x = generative_transpose_apply(coarse_feats, parent_idx, offset_id,
                                       w, fine_mask)
        x = MaskedBatchNorm(name='norm1')(x, fine_mask, train)
        x = nn.elu(x)
        x = SparseConv(self.out_channels, fine_nbr.shape[-1],
                       name='conv', self_map=True)(x, fine_nbr, fine_mask)
        x = MaskedBatchNorm(name='norm2')(x, fine_mask, train)
        return nn.elu(x)


class _OutBlock(nn.Module):
    """conv3 + BN + ELU (reference mink_neck.py:61-76)."""
    out_channels: int

    @nn.compact
    def __call__(self, feats, nbr, mask, train: bool = False):
        x = SparseConv(self.out_channels, nbr.shape[-1], name='conv',
                       self_map=True)(feats, nbr, mask)
        x = MaskedBatchNorm(name='norm')(x, mask, train)
        return nn.elu(x)


def _compact_by_score(arrays, scores, mask, k: int):
    """Gather the k best-scoring valid rows of each array (static shape)."""
    s = jnp.where(mask, scores, -jnp.inf)
    _, idx = jax.lax.top_k(s, k)  # (B, k)
    out_mask = jnp.take_along_axis(mask, idx, axis=1)

    def take(a):
        g = jnp.take_along_axis(a, idx[..., None].astype(jnp.int32), axis=1)
        return jnp.where(out_mask[..., None], g, 0.0)

    return [take(a) for a in arrays], out_mask


@MODELS.register_module()
class MinkNeck(nn.Module):
    """Sparse FPN + pruning head.

    Returns (feats (B, 4·P, C_out), scores (B, 4·P, num_classes),
    xyz (B, 4·P, 3), mask (B, 4·P)) with P = pts_prune_threshold —
    the padded-static equivalent of the reference's per-sample
    concatenated lists (mink_neck.py:216-245).

    `inputs` carry the backbone features; if `paint_fn` is given it is
    called per level on the post-compaction voxel set and its output is
    concatenated to the backbone features (the 2D→3D painting of
    reference detector :404-479 — `in_channels` must be the painted
    widths). With paint_fn=None the inputs are used as-is (prepainted).
    """
    num_classes: int = 1
    in_channels: Sequence[int] = (128, 256, 512, 1024)
    out_channels: int = 256
    voxel_size: float = 0.01
    pts_prune_threshold: int = 1000
    # static capacity of the up-block support (children-of-survivors
    # analog); 0 → 4 × pts_prune_threshold
    prune_up_capacity: int = 0

    @nn.compact
    def __call__(self, inputs: List[SparseLevel], train: bool = False,
                 self_maps=None, paint_fn: Optional[PaintFn] = None):
        n = len(inputs)
        P = self.pts_prune_threshold
        Pup = self.prune_up_capacity or 4 * P
        conv_cls = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(_PRIOR_BIAS),
            name='conv_cls')

        def paint_concat(lvl: SparseLevel, i: int) -> jnp.ndarray:
            if paint_fn is None:
                return lvl.feats
            feat2d = paint_fn(lvl.world_xyz(), lvl.mask, i)
            return jnp.concatenate([lvl.feats, feat2d], -1)

        feats_l, scores_l, xyz_l, mask_l = [], [], [], []
        cur: SparseLevel = None  # coarser level, compacted, feats = x
        prune_score = None  # (B, Vc): 0 at pruned/invalid slots,
        # matching ME features_at_coordinates' 0-for-missing
        for i in range(n - 1, -1, -1):
            fine = inputs[i]
            if i < n - 1:
                # parent score at every occupied fine voxel
                # (~ME features_at_coordinates, reference :173-184)
                pkeys = jnp.where(
                    fine.mask, linearize(fine.coords // 2, cur.extent),
                    SENTINEL)
                parent_idx = lookup_center(cur.keys, pkeys)
                hit = parent_idx >= 0
                ps = jnp.take_along_axis(
                    prune_score, jnp.where(hit, parent_idx, 0), axis=1)
                ps = jnp.where(hit, ps, 0.0)
                # stage 1: physical prune to the up-block support
                lvl, (ps_c, ), _ = compact_topk(
                    fine, ps, min(Pup, fine.capacity), extras=(ps, ))
                skip = paint_concat(lvl, i)
                parent_idx_c, offset_id = generative_transpose_map(lvl, cur)
                nbr_up = build_neighbor_map(lvl, lvl, 3, 1)
                up = _UpBlock(self.in_channels[i],
                              name=f'up_block_{i + 1}')(
                                  cur.feats, parent_idx_c, offset_id,
                                  nbr_up, lvl.mask, train)
                x = skip + up
                # stage 2: physical prune to P (same score/tie-break as
                # stage 1 → exactly the top-P of the original level)
                lvl, _, _ = compact_topk(lvl._replace(feats=x), ps_c,
                                         min(P, lvl.capacity))
                x = lvl.feats
                nbr_out = build_neighbor_map(lvl, lvl, 3, 1)
            else:
                lvl = fine
                x = paint_concat(lvl, i)
                lvl = lvl._replace(feats=x)
                # brick backbone stages return None here (no cell
                # self-map was ever built — see MinkResNet.brick_stages)
                nbr_out = (self_maps[i]
                           if self_maps is not None
                           and self_maps[i] is not None
                           else build_neighbor_map(lvl, lvl, 3, 1))

            out = _OutBlock(self.out_channels, name=f'out_block_{i}')(
                x, nbr_out, lvl.mask, train)
            cls_pred = conv_cls(out)
            cls_pred = jnp.where(lvl.mask[..., None], cls_pred, 0.0)
            prune_score = jnp.max(cls_pred, axis=-1)  # (B, Vl)
            prune_score = jnp.where(lvl.mask, prune_score, 0.0)
            cur = lvl._replace(feats=x)

            (f, sc, p), m = _compact_by_score(
                [out, cls_pred, lvl.world_xyz()],
                jnp.where(lvl.mask, jnp.max(cls_pred, -1), -jnp.inf),
                lvl.mask, min(P, lvl.capacity))
            feats_l.append(f)
            scores_l.append(sc)
            xyz_l.append(p)
            mask_l.append(m)

        # reference appends coarsest-first (loop i = n-1 … 0)
        feats = jnp.concatenate(feats_l, axis=1)
        scores = jnp.concatenate(scores_l, axis=1)
        xyz = jnp.concatenate(xyz_l, axis=1)
        mask = jnp.concatenate(mask_l, axis=1)
        return feats, scores, xyz, mask
