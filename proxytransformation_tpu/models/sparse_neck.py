"""Sparse FPN neck with score-based voxel pruning (MinkNeck), TPU-native.

Re-design of the reference `MinkNeck` (reference:
embodiedscan/models/necks/mink_neck.py:20-245): top-down FPN over the
four sparse backbone levels with a generative transpose-conv up path,
per-level 1-class scoring, and pruning to `pts_prune_threshold` voxels
per sample per level (reference :163-186). The fp32 autocast guard of
the reference (:150-151) is inherent here — pruning math runs in fp32.

Static-shape output: instead of ragged per-sample lists
(reference convert_to_batch :216-245), each level is compacted to
exactly `pts_prune_threshold` rows by score, and the levels are
concatenated into (B, 4·P, C) + validity mask.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.sparse import (SparseLevel, build_neighbor_map,
                          generative_transpose_apply,
                          generative_transpose_map, prune_topk,
                          sparse_conv_apply)
from ..utils.registry import MODELS
from .norms import MaskedBatchNorm
from .sparse_resnet import SparseConv, _self_map_k1

_PRIOR_BIAS = float(-np.log((1 - 0.01) / 0.01))  # bias_init_with_prob(.01)


class _UpBlock(nn.Module):
    """GenerativeTranspose(k2 s2) + BN + ELU + conv3 + BN + ELU
    (reference mink_neck.py:79-100), evaluated at the skip level's
    coordinate set."""
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
    """
    num_classes: int = 1
    in_channels: Sequence[int] = (128, 256, 512, 1024)
    out_channels: int = 256
    voxel_size: float = 0.01
    pts_prune_threshold: int = 1000

    @nn.compact
    def __call__(self, inputs: List[SparseLevel], train: bool = False,
                 self_maps=None):
        n = len(inputs)
        conv_cls = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(_PRIOR_BIAS),
            name='conv_cls')

        feats_l, scores_l, xyz_l, mask_l = [], [], [], []
        x = inputs[-1].feats
        cur_mask = inputs[-1].mask
        prune_score = None  # (B, V_coarse): 0 at pruned/invalid slots,
        # matching ME features_at_coordinates' 0-for-missing
        for i in range(n - 1, -1, -1):
            fine = inputs[i]
            fine_nbr = (self_maps[i] if self_maps is not None
                        else build_neighbor_map(fine, fine, 3, 1))
            if i < n - 1:
                coarse = inputs[i + 1]
                parent_idx, offset_id = generative_transpose_map(fine, coarse)
                up = _UpBlock(self.in_channels[i],
                              name=f'up_block_{i + 1}')(
                                  x, parent_idx, offset_id, fine_nbr,
                                  fine.mask, train)
                x = fine.feats + up
                # prune by the coarser level's cls score looked up at the
                # parent voxel (~ME features_at_coordinates,
                # reference :173-184); missing/pruned parent → 0
                hit = parent_idx >= 0
                ps = jnp.take_along_axis(
                    prune_score, jnp.where(hit, parent_idx, 0), axis=1)
                ps = jnp.where(hit, ps, 0.0)
                pruned = prune_topk(fine._replace(feats=x), ps,
                                    self.pts_prune_threshold)
                x, cur_mask = pruned.feats, pruned.mask
            else:
                cur_mask = fine.mask

            out = _OutBlock(self.out_channels, name=f'out_block_{i}')(
                x, fine_nbr, cur_mask, train)
            cls_pred = conv_cls(out)
            cls_pred = jnp.where(cur_mask[..., None], cls_pred, 0.0)
            prune_score = jnp.max(cls_pred, axis=-1)  # (B, V)
            prune_score = jnp.where(cur_mask, prune_score, 0.0)

            (f, sc, p), m = _compact_by_score(
                [out, cls_pred, fine.world_xyz()],
                jnp.where(cur_mask, jnp.max(cls_pred, -1), -jnp.inf),
                cur_mask, min(self.pts_prune_threshold, fine.capacity))
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
