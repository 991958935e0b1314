"""Smaller inventory components.

- `ExpMomentumEMA` (reference models/layers/ema.py:123-189): exponential
  momentum weight averaging as a functional update on param pytrees.
- `Anchor3DRangeGenerator` / `AlignedAnchor3DRangeGenerator` (reference
  models/task_modules/anchor/anchor_3d_generator.py:11-354): legacy
  mmdet3d-style anchor grids (unused by the grounding path, kept for
  inventory parity).
- `ChannelMapper` (reference models/necks/channel_mapper.py:18-90): 1×1
  convs unifying per-level channels on sparse levels.
- `TransformerEncoder` cross-view interactor + `get_sine_pos_embed`
  (reference models/necks/transformer.py:10-305; commented out of the
  final config but part of the inventory).
- extra match costs (`FocalLossCost`, `TokenMapCost`; reference
  models/losses/match_cost.py:116-211,78-93).
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.sparse import SparseLevel
from ..utils.registry import MODELS, TASK_UTILS


# --------------------------------------------------------------------------
class ExpMomentumEMA:
    """EMA with exponentially ramped momentum (reference ema.py:123-189)."""

    def __init__(self, momentum: float = 0.0002, gamma: int = 2000):
        self.momentum = momentum
        self.gamma = gamma

    def update(self, ema_params, params, step):
        # jnp-exp so `step` may be a traced array inside the jitted
        # train step (engine/train.py::make_train_step wiring)
        m = (1 - self.momentum) * jnp.exp(
            -(1 + step) / self.gamma) + self.momentum
        return jax.tree_util.tree_map(
            lambda e, p: (1 - m) * e + m * p, ema_params, params)


# --------------------------------------------------------------------------
@TASK_UTILS.register_module()
class Anchor3DRangeGenerator:
    """Uniform 3D anchor grid over a range (legacy parity)."""

    def __init__(self, ranges: Sequence[Sequence[float]],
                 sizes: Sequence[Sequence[float]] = ((3.9, 1.6, 1.56), ),
                 rotations: Sequence[float] = (0.0, 1.5707963),
                 align_corner: bool = False):
        self.ranges = ranges
        self.sizes = sizes
        self.rotations = rotations
        self.align_corner = align_corner

    def grid_anchors(self, featmap_size, device=None):
        ws, hs, ds = featmap_size
        out = []
        for rng in self.ranges:
            x = jnp.linspace(rng[0], rng[3], ws + (0 if self.align_corner
                                                   else 1))
            y = jnp.linspace(rng[1], rng[4], hs + (0 if self.align_corner
                                                   else 1))
            z = jnp.linspace(rng[2], rng[5], ds + (0 if self.align_corner
                                                   else 1))
            if not self.align_corner:
                x = (x[:-1] + x[1:]) / 2
                y = (y[:-1] + y[1:]) / 2
                z = (z[:-1] + z[1:]) / 2
            gx, gy, gz = jnp.meshgrid(x, y, z, indexing='ij')
            ctr = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
            anchors = []
            for size in self.sizes:
                for rot in self.rotations:
                    a = jnp.concatenate([
                        ctr,
                        jnp.broadcast_to(jnp.asarray(size), ctr[:, :3].shape),
                        jnp.full((ctr.shape[0], 1), rot),
                    ], -1)
                    anchors.append(a)
            out.append(jnp.stack(anchors, 1).reshape(-1, 7))
        return out


@TASK_UTILS.register_module()
class AlignedAnchor3DRangeGenerator(Anchor3DRangeGenerator):

    def __init__(self, *args, **kw):
        kw.setdefault('align_corner', False)
        super().__init__(*args, **kw)


# --------------------------------------------------------------------------
@MODELS.register_module()
class ChannelMapper(nn.Module):
    """1×1 convs to unify sparse level channels (reference
    channel_mapper.py:18-90)."""
    out_channels: int

    @nn.compact
    def __call__(self, levels: List[SparseLevel]) -> List[SparseLevel]:
        out = []
        for i, lvl in enumerate(levels):
            f = nn.Dense(self.out_channels, name=f'conv_{i}')(lvl.feats)
            f = jnp.where(lvl.mask[..., None], f, 0.0)
            out.append(lvl._replace(feats=f))
        return out


# --------------------------------------------------------------------------
def get_sine_pos_embed(pos: jnp.ndarray, num_feats: int = 128,
                       temperature: int = 10000) -> jnp.ndarray:
    """Sine positional embedding (reference transformer.py:~270-305)."""
    scale = 2 * jnp.pi
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    emb = pos[..., None] * scale / dim_t  # (..., D, num_feats)
    emb = jnp.concatenate([jnp.sin(emb[..., 0::2]),
                           jnp.cos(emb[..., 1::2])], -1)
    return emb.reshape(pos.shape[:-1] + (-1, ))


@MODELS.register_module()
class TransformerEncoder(nn.Module):
    """Cross-view feature interactor (reference transformer.py:10-305;
    unused in the final reference config)."""
    embed_dims: int = 256
    num_layers: int = 3
    num_heads: int = 8
    feedforward_channels: int = 1024

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        from .decoder import MultiheadAttention, FFN
        for i in range(self.num_layers):
            x = MultiheadAttention(self.embed_dims, self.num_heads,
                                   name=f'attn_{i}')(
                x, x, x, key_padding_mask=(
                    ~mask if mask is not None else None),
                deterministic=deterministic)
            x = nn.LayerNorm(name=f'norm1_{i}')(x)
            x = FFN(self.embed_dims, self.feedforward_channels,
                    name=f'ffn_{i}')(x, deterministic)
            x = nn.LayerNorm(name=f'norm2_{i}')(x)
        return x


# --------------------------------------------------------------------------
def focal_loss_cost(cls_logits: jnp.ndarray, gt_labels: jnp.ndarray,
                    alpha: float = 0.25, gamma: float = 2.0,
                    eps: float = 1e-12) -> jnp.ndarray:
    """FocalLossCost for hard integer labels (reference :142-159)."""
    p = jax.nn.sigmoid(cls_logits)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * p ** gamma
    pos = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    return pos[:, gt_labels] - neg[:, gt_labels]


def token_map_cost(pred_logits: jnp.ndarray,
                   gt_logits: jnp.ndarray) -> jnp.ndarray:
    """TokenMapCost (reference :78-93)."""
    return pred_logits @ gt_logits.T
