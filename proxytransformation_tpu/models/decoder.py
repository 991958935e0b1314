"""DETR-style grounding decoder with per-layer box refinement.

Re-design of the reference `SparseFeatureFusionTransformerDecoder`
(reference: models/layers/ground_transformer/decoder.py:22-317): 6
layers of self-attn → text cross-attn → point cross-attn → FFN, with
learned positional embeddings from the current 9-DoF box predictions
(query side) and voxel xyz (key side), and per-layer bbox refinement
through the (shared) head regression branch.

Masked static shapes: query/key/text paddings are carried as boolean
masks and applied as -1e9 attention biases.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .norms import MaskedBatchNorm


class MultiheadAttention(nn.Module):
    """Post-norm residual MHA (mmcv MultiheadAttention semantics:
    out = residual + proj_drop(attn(q+qpos, k+kpos, v)))."""
    embed_dims: int = 256
    num_heads: int = 8
    dropout: float = 0.0
    # compute dtype for projections and attention matmuls; the softmax
    # itself runs in float32 (accumulated via preferred_element_type)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, query_pos=None, key_pos=None,
                 key_padding_mask=None, attn_bias=None,
                 deterministic: bool = True):
        # key_padding_mask: (B, K) True = PADDED (torch convention)
        residual = query
        q = query if query_pos is None else query + query_pos
        k = key if key_pos is None else key + key_pos
        B, Q, C = q.shape
        H = self.num_heads
        hd = C // H
        qp = nn.Dense(C, dtype=self.dtype, name='q_proj')(q)
        kp = nn.Dense(C, dtype=self.dtype, name='k_proj')(k)
        vp = nn.Dense(C, dtype=self.dtype, name='v_proj')(value)
        split = lambda t: t.reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
        qp, kp, vp = split(qp), split(kp), split(vp)
        logits = jnp.einsum('bhqd,bhkd->bhqk', qp, kp,
                            preferred_element_type=jnp.float32) * hd ** -0.5
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], -1e9,
                               logits)
        if attn_bias is not None:
            logits = logits + attn_bias
        attn = nn.softmax(logits, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, vp,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, Q, C)
        out = nn.Dense(C, dtype=self.dtype, name='out_proj')(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return (residual + out).astype(jnp.float32)


class PositionEmbeddingLearned(nn.Module):
    """conv1d-BN-ReLU-conv1d over tokens (reference decoder.py:22-36).

    The BatchNorm is masked (deviation: the reference's BN also counts
    zero-padded tokens; with our larger static padding that would skew
    the statistics, so stats here use valid tokens only).
    """
    embed_dims: int = 256

    @nn.compact
    def __call__(self, xyz, mask=None, train: bool = False):
        if mask is None:
            mask = jnp.ones(xyz.shape[:2], bool)
        x = nn.Dense(self.embed_dims, name='conv1')(xyz)
        x = MaskedBatchNorm(name='bn')(x, mask, train)
        x = nn.relu(x)
        return nn.Dense(self.embed_dims, name='conv2')(x)


class FFN(nn.Module):
    embed_dims: int = 256
    feedforward_channels: int = 2048
    ffn_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        x = nn.Dense(self.feedforward_channels, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.ffn_drop, deterministic=deterministic)(x)
        x = nn.Dense(self.embed_dims, dtype=self.dtype)(x)
        x = nn.Dropout(self.ffn_drop, deterministic=deterministic)(x)
        return (residual + x).astype(jnp.float32)


class DecoderLayer(nn.Module):
    """self-attn → cross-attn(text) → cross-attn(points) → FFN
    (reference decoder.py:39-181)."""
    embed_dims: int = 256
    num_heads: int = 8
    dropout: float = 0.0
    feedforward_channels: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, query_pos, key_pos,
                 key_padding_mask, text_feats, text_padding_mask,
                 deterministic: bool = True):
        query = MultiheadAttention(self.embed_dims, self.num_heads,
                                   self.dropout, self.dtype,
                                   name='self_attn')(
            query, query, query, query_pos, query_pos,
            deterministic=deterministic)
        query = nn.LayerNorm(name='norm0')(query)
        query = MultiheadAttention(self.embed_dims, self.num_heads,
                                   self.dropout, self.dtype,
                                   name='cross_attn_text')(
            query, text_feats, text_feats, query_pos, None,
            key_padding_mask=text_padding_mask, deterministic=deterministic)
        query = nn.LayerNorm(name='norm1')(query)
        query = MultiheadAttention(self.embed_dims, self.num_heads,
                                   self.dropout, self.dtype,
                                   name='cross_attn')(
            query, key, value, query_pos, key_pos,
            key_padding_mask=key_padding_mask, deterministic=deterministic)
        query = nn.LayerNorm(name='norm2')(query)
        query = FFN(self.embed_dims, self.feedforward_channels,
                    dtype=self.dtype, name='ffn')(query, deterministic)
        return nn.LayerNorm(name='norm3')(query)


class SparseFeatureFusionTransformerDecoder(nn.Module):
    """Stacked decoder with box refinement (reference decoder.py:184-317).

    The refinement callback (`reg_branch_fn`, `bbox_coder_fn`) comes from
    the grounding head so the regression branch is shared, as in the
    reference (:303-308).
    """
    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    dropout: float = 0.0
    feedforward_channels: int = 2048
    remat: bool = False  # rematerialize per layer (jax.checkpoint)
    # compute dtype for attention/FFN matmuls (LayerNorms, position
    # nets and box refinement stay float32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, feats, feats_padding_mask, query_coords,
                 feats_coords, pred_bboxes, text_feats, text_padding_mask,
                 reg_branch_fn: Callable, bbox_coder_fn: Callable,
                 feats_mask=None, query_mask=None,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        inter, inter_boxes = [], []
        key_pos_net = PositionEmbeddingLearned(self.embed_dims,
                                               name='cross_posembed')
        query_pos_net = PositionEmbeddingLearned(self.embed_dims,
                                                 name='self_posembed')
        norm = nn.LayerNorm(name='norm')
        key_pos = None
        for lid in range(self.num_layers):
            query_pos = query_pos_net(pred_bboxes, query_mask,
                                      train=not deterministic)
            if key_pos is None:  # key coords are constant across layers
                key_pos = key_pos_net(feats_coords, feats_mask,
                                      train=not deterministic)
            layer_cls = (nn.remat(DecoderLayer, static_argnums=(9, ))
                         if self.remat else DecoderLayer)
            query = layer_cls(self.embed_dims, self.num_heads,
                              self.dropout, self.feedforward_channels,
                              self.dtype, name=f'layer_{lid}')(
                query, feats, feats, query_pos, key_pos,
                feats_padding_mask, text_feats, text_padding_mask,
                deterministic)
            bbox_preds = reg_branch_fn(query)
            new_pred = bbox_coder_fn(query_coords, bbox_preds)
            pred_bboxes = jax.lax.stop_gradient(new_pred)
            inter.append(norm(query))
            inter_boxes.append(new_pred)
        return jnp.stack(inter), jnp.stack(inter_boxes)
