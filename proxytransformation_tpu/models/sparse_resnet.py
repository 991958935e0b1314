"""Sparse 3D ResNet backbone on the TPU-native voxel engine.

Re-design of the reference `MinkResNet` (reference:
embodiedscan/models/backbones/mink_resnet.py:20-144, depth-34 BasicBlock
config) on top of ops/sparse.py: neighbor maps are built once per level
transition and shared by all convolutions on that pair; every conv is a
gather + MXU matmul scan.

Architecture (voxel strides relative to the 1 cm input level):
    conv1 k3 s2 (→2 cm) → InstanceNorm → ReLU → maxpool k2 s2 (→4 cm)
    → 4 stages of BasicBlocks, each starting with stride 2
    (→8/16/32/64 cm), channels 64/128/256/512.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops.brick import (brick_expand, brick_pack, brick_unpack,
                         build_brick_level)
from ..ops.sparse import (SparseLevel, build_neighbor_map, downsample_coords,
                          sparse_conv, sparse_max_pool)
from ..utils.registry import MODELS
from .norms import MaskedBatchNorm, MaskedInstanceNorm

_KAIMING = nn.initializers.variance_scaling(2.0, 'fan_out',
                                            'truncated_normal')


class SparseConv(nn.Module):
    """Sparse convolution layer: params only; geometry comes via `nbr`.

    `self_map=True` marks stride-1 same-level maps, routing to the
    Pallas monotone-window kernel on TPU (ops/sparse_conv_pallas.py).
    """
    out_channels: int
    kernel_volume: int  # K³
    use_bias: bool = False
    self_map: bool = False

    @nn.compact
    def __call__(self, feats, nbr, out_mask):
        w = self.param('kernel', _KAIMING,
                       (self.kernel_volume, feats.shape[-1],
                        self.out_channels))
        out = sparse_conv(feats, nbr, w, out_mask, self_map=self.self_map)
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros,
                           (self.out_channels, ))
            out = jnp.where(out_mask[..., None],
                            out + b.astype(out.dtype), 0.0)
        return out


class SparseBasicBlock(nn.Module):
    """conv3-BN-ReLU-conv3-BN (+1x1 downsample) + ReLU (ME BasicBlock)."""
    planes: int
    conv1_self: bool = True  # False for the strided first block

    @nn.compact
    def __call__(self, feats, in_mask, out_mask, nbr_conv1, nbr_conv2,
                 nbr_down=None, train: bool = False):
        identity = feats
        x = SparseConv(self.planes, nbr_conv1.shape[-1], name='conv1',
                       self_map=self.conv1_self)(
            feats, nbr_conv1, out_mask)
        x = MaskedBatchNorm(name='norm1')(x, out_mask, train)
        x = nn.relu(x)
        x = SparseConv(self.planes, nbr_conv2.shape[-1], name='conv2',
                       self_map=True)(
            x, nbr_conv2, out_mask)
        x = MaskedBatchNorm(name='norm2')(x, out_mask, train)
        if nbr_down is not None:
            identity = SparseConv(self.planes, 1, name='downsample_conv')(
                feats, nbr_down, out_mask)
            identity = MaskedBatchNorm(name='downsample_norm')(
                identity, out_mask, train)
        return nn.relu(x + identity)


class SparseBottleneck(nn.Module):
    """1x1-3x3-1x1 bottleneck (expansion 4, ME Bottleneck)."""
    planes: int
    expansion: int = 4
    conv2_self: bool = True  # False for the strided first block

    @nn.compact
    def __call__(self, feats, in_mask, out_mask, nbr_conv_mid, nbr_self1,
                 nbr_down=None, train: bool = False):
        identity = feats
        # 1x1 at input level feeding the (possibly strided) 3x3
        x = SparseConv(self.planes, 1, name='conv1')(
            feats, _self_map_k1(feats, in_mask), in_mask)
        x = MaskedBatchNorm(name='norm1')(x, in_mask, train)
        x = nn.relu(x)
        x = SparseConv(self.planes, nbr_conv_mid.shape[-1], name='conv2',
                       self_map=self.conv2_self)(
            x, nbr_conv_mid, out_mask)
        x = MaskedBatchNorm(name='norm2')(x, out_mask, train)
        x = nn.relu(x)
        x = SparseConv(self.planes * self.expansion, 1, name='conv3')(
            x, _self_map_k1(x, out_mask), out_mask)
        x = MaskedBatchNorm(name='norm3')(x, out_mask, train)
        if nbr_down is not None:
            identity = SparseConv(self.planes * self.expansion, 1,
                                  name='downsample_conv')(feats, nbr_down,
                                                          out_mask)
            identity = MaskedBatchNorm(name='downsample_norm')(
                identity, out_mask, train)
        return nn.relu(x + identity)


class BrickConv(nn.Module):
    """3^3 conv in brick format: the learnable parameter is the SAME
    (27, C_in, C_out) cell stencil as SparseConv (checkpoint/parity
    compatible); `brick_expand` lifts it to the (27, 8C, 8C)
    block-structured brick weights each call (a static 0/1 einsum —
    autodiff routes dW_brick back to the cell stencil)."""
    out_channels: int

    @nn.compact
    def __call__(self, bfeats, bnbr, brick_mask):
        c_in = bfeats.shape[-1] // 8
        w = self.param('kernel', _KAIMING, (27, c_in, self.out_channels))
        return sparse_conv(bfeats, bnbr, brick_expand(w), brick_mask,
                           self_map=True)


def _brick_norm(norm: MaskedBatchNorm, bx, slot_mask, train):
    """Apply a MaskedBatchNorm over the brick view: (B, Vb, 8C)
    reshaped to (B, Vb*8, C) rows with the slot mask — IDENTICAL stats,
    params, and param paths to the cell-format norm (same valid
    (cell, channel) set, same (C,) scale/bias)."""
    B, Vb, c8 = bx.shape
    c = c8 // 8
    y = norm(bx.reshape(B, Vb * 8, c), slot_mask.reshape(B, Vb * 8), train)
    return y.reshape(B, Vb, c8)


class BrickBasicBlock(nn.Module):
    """SparseBasicBlock in brick format (stride-1 residual blocks):
    same param tree (conv1/norm1/conv2/norm2), ~4x fewer map rows and
    MXU-wide matmuls (see ops/brick.py)."""
    planes: int

    @nn.compact
    def __call__(self, bx, bnbr, brick_mask, slot_mask, train: bool = False):
        identity = bx
        x = BrickConv(self.planes, name='conv1')(bx, bnbr, brick_mask)
        x = _brick_norm(MaskedBatchNorm(name='norm1'), x, slot_mask, train)
        x = nn.relu(x)
        x = BrickConv(self.planes, name='conv2')(x, bnbr, brick_mask)
        x = _brick_norm(MaskedBatchNorm(name='norm2'), x, slot_mask, train)
        return nn.relu(x + identity)


class BrickEntryBlock(nn.Module):
    """Stage-entry BasicBlock for brick stages: the strided conv1 and
    the 1x1 downsample run in cell format (their maps are strided), the
    results are packed once, and conv2 + the residual add run in brick
    format. Param tree matches SparseBasicBlock exactly."""
    planes: int

    @nn.compact
    def __call__(self, feats, out_mask, brick_mask, slot_mask, nbr_stride3,
                 nbr_stride1, pmap, unb8, bnbr, train: bool = False):
        x = SparseConv(self.planes, nbr_stride3.shape[-1], name='conv1')(
            feats, nbr_stride3, out_mask)
        x = MaskedBatchNorm(name='norm1')(x, out_mask, train)
        x = nn.relu(x)
        bx = brick_pack(x, pmap, unb8, brick_mask, out_mask)
        bx = BrickConv(self.planes, name='conv2')(bx, bnbr, brick_mask)
        bx = _brick_norm(MaskedBatchNorm(name='norm2'), bx, slot_mask, train)
        identity = SparseConv(self.planes, 1, name='downsample_conv')(
            feats, nbr_stride1, out_mask)
        identity = MaskedBatchNorm(name='downsample_norm')(
            identity, out_mask, train)
        b_id = brick_pack(identity, pmap, unb8, brick_mask, out_mask)
        return nn.relu(bx + b_id)


def _self_map_k1(feats, mask):
    """Identity neighbor map for a 1x1 conv on the same level."""
    B, V = mask.shape
    idx = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32)[None, :, None],
                           (B, V, 1))
    return jnp.where(mask[..., None], idx, -1)


@MODELS.register_module()
class MinkResNet(nn.Module):
    """Sparse ResNet over a voxelized point cloud.

    Capacities are the per-sample static voxel budgets of the 6 internal
    levels (conv1/2cm, pool/4cm, stage1..4). Defaults are sized for
    100k-point scans (reference per-sample occupancies ≈ 82k/71k/43k/
    15k/3.7k/0.9k, mink_resnet.py:135-142 comments).
    """
    depth: int = 34
    in_channels: int = 3
    num_stages: int = 4
    pool: bool = True
    norm: str = 'instance'  # stem norm; 'batch' if BATCHNORM=1 in reference
    capacities: Sequence[int] = (100_000, 80_000, 50_000, 20_000, 6_000,
                                 2_000)
    # stages run in 2x2x2 brick format (ops/brick.py). Default OFF — it
    # LOSES integrated on the v5e, measured (tools/profile_brick.py,
    # surface scene, B=2, full backbone fwd): cell () 113.4 ms,
    # brick (0,) 119.8 ms, brick (1,) 153.7 ms. The isolated s1 conv
    # win (4.27 vs 5.97 ms, tools/brick_analysis.py) does not survive
    # integration: stage 0's level holds only 1.83 cells/brick (maps
    # shrink 1.8x while dense-brick FLOPs grow 8x), and stage 1's
    # 8C=1024-wide expanded weights make the conv matmul-FLOP-bound
    # (~16x the useful cell FLOPs; a block-sparse brick kernel would
    # instead serialize 216 one-hot/dot steps vs the cell kernel's 27,
    # i.e. worse than the gathers it removes). Kept as exact, tested
    # infrastructure (tests/test_brick.py): any 'basic' stage i with
    # 3 + i < len(capacities) can be flipped on, param-tree compatible
    # with cell checkpoints.
    brick_stages: Sequence[int] = ()
    remat: bool = False  # rematerialize per block (jax.checkpoint)
    # compute dtype for the residual stages. The stem conv (3ch xyz
    # input) and its norm stay float32 — raw coordinates as features
    # should not be quantized before the first normalization; every
    # conv's MXU matmul is bf16 internally either way (the Pallas
    # kernel casts), this knob additionally halves the inter-layer
    # activation traffic and stashes.
    dtype: jnp.dtype = jnp.float32

    arch_settings = {
        14: ('basic', (1, 1, 1, 1)),  # ME ResNet14 analog (test scale)
        18: ('basic', (2, 2, 2, 2)),
        34: ('basic', (3, 4, 6, 3)),
        50: ('bottleneck', (3, 4, 6, 3)),
        101: ('bottleneck', (3, 4, 23, 3)),
    }

    @nn.compact
    def __call__(self, level0: SparseLevel, train: bool = False,
                 return_self_maps: bool = False):
        block_type, stage_blocks = self.arch_settings[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        caps = list(self.capacities)

        # stem: conv1 k3 s2
        lvl = downsample_coords(level0, caps[0])
        nbr = build_neighbor_map(level0, lvl, kernel_size=3, stride=2)
        x = SparseConv(64, 27, name='conv1')(level0.feats, nbr, lvl.mask)
        # stem INPUT stays f32 (raw xyz features); everything after the
        # first conv flows in compute dtype — at B=6 the f32 stem
        # activations alone are ~450 MB of backward stash
        x = x.astype(self.dtype)
        if self.norm == 'batch':
            x = MaskedBatchNorm(name='norm1')(x, lvl.mask, train)
        else:
            x = MaskedInstanceNorm(name='norm1')(x, lvl.mask, train)
        x = nn.relu(x).astype(self.dtype)
        if self.pool:
            plvl = downsample_coords(lvl, caps[1])
            pnbr = build_neighbor_map(lvl, plvl, kernel_size=2, stride=2)
            x = sparse_max_pool(x, pnbr, plvl.mask)
            lvl = plvl

        outs: List[SparseLevel] = []
        self_maps = []
        for i, n_blocks in enumerate(stage_blocks):
            planes = 64 * 2 ** i
            new_lvl = downsample_coords(lvl, caps[2 + i])
            nbr_stride3 = build_neighbor_map(lvl, new_lvl, 3, 2)
            # the 1×1 stride-2 map is the k3 map's center offset
            # (kernel_offsets(3) puts (0,0,0) at index 13) — no extra
            # sort-join needed
            nbr_stride1 = nbr_stride3[..., 13:14]

            if (block_type == 'basic' and i in self.brick_stages
                    and 3 + i < len(caps)):
                # brick stage: entry block packs after its strided
                # conv1; every stride-1 self conv runs at brick
                # granularity; the cell self-map is never built (the
                # neck only consumes the coarsest stage's self map)
                blvl, pmap, unb8, slot_mask = build_brick_level(
                    new_lvl, caps[3 + i])
                bnbr = build_neighbor_map(blvl, blvl, 3, 1)
                entry_cls = (nn.remat(BrickEntryBlock,
                                      static_argnums=(10, ))
                             if self.remat else BrickEntryBlock)
                brick_cls = (nn.remat(BrickBasicBlock, static_argnums=(5, ))
                             if self.remat else BrickBasicBlock)
                x = entry_cls(planes, name=f'layer{i + 1}_0')(
                    x, new_lvl.mask, blvl.mask, slot_mask, nbr_stride3,
                    nbr_stride1, pmap, unb8, bnbr, train)
                for j in range(1, n_blocks):
                    x = brick_cls(planes, name=f'layer{i + 1}_{j}')(
                        x, bnbr, blvl.mask, slot_mask, train)
                x = brick_unpack(x, pmap, unb8, blvl.mask, new_lvl.mask)
                lvl = new_lvl
                outs.append(lvl._replace(feats=x))
                self_maps.append(None)
                continue

            nbr_self = build_neighbor_map(new_lvl, new_lvl, 3, 1)
            for j in range(n_blocks):
                first = j == 0
                basic_cls = (nn.remat(SparseBasicBlock,
                                      static_argnums=(7, ))
                             if self.remat else SparseBasicBlock)
                bott_cls = (nn.remat(SparseBottleneck,
                                     static_argnums=(7, ))
                            if self.remat else SparseBottleneck)
                if block_type == 'basic':
                    need_down = first  # stride 2 always at block 0
                    x = basic_cls(planes, conv1_self=not first,
                                  name=f'layer{i + 1}_{j}')(
                        x, lvl.mask if first else new_lvl.mask,
                        new_lvl.mask,
                        nbr_stride3 if first else nbr_self, nbr_self,
                        nbr_stride1 if need_down else None, train)
                else:
                    exp_ch = planes * 4
                    need_down = first or x.shape[-1] != exp_ch
                    x = bott_cls(planes, conv2_self=not first,
                                 name=f'layer{i + 1}_{j}')(
                        x, lvl.mask if first else new_lvl.mask,
                        new_lvl.mask,
                        nbr_stride3 if first else nbr_self, nbr_self,
                        nbr_stride1 if need_down and first else
                        (_self_map_k1(x, new_lvl.mask) if need_down else
                         None), train)
            lvl = new_lvl
            outs.append(lvl._replace(feats=x))
            self_maps.append(nbr_self)
        if return_self_maps:
            return outs, self_maps
        return outs
