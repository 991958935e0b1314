"""Text-encoder zoo: the reference's `t_type` selection, TPU-native.

The reference detector picks its frozen text tower from a t_type string
(reference models/detectors/sparse_featfusion_grounder_preshape.py:
131-277): Roberta / BERT / T5 / DeBERTa / FLAVA / CLIP / open_clip
variants, all consumed as per-token `last_hidden_state` features plus
an attention mask. Flax implementations here share that contract:

    encoder(input_ids (B, L), attention_mask (B, L)) -> (B, L, width)

* `BertTextEncoder` — post-LN bidirectional transformer with GELU and
  token-type embeddings (covers 'bert-base-uncased'; FLAVA's text tower
  is BERT-architecture, so 'flava' maps here too).
* `RobertaTextEncoder` — BERT body with Roberta's position-id offset
  (positions start at padding_idx+1 = 2; covers 'roberta-base', the
  reference's default t_type).
* `T5TextEncoder` — encoder stack with RMSNorm, bias-free dense layers
  and bucketed relative position bias (covers 't5-small/base/...').
* CLIP / open_clip towers reuse `CLIPTextEncoder` (text_encoder.py)
  with per-variant width/layers/heads (open_clip towers are the same
  architecture at different sizes).

`build_text_encoder(t_type)` mirrors the reference's string dispatch;
HF-weight converters follow each class. DeBERTa's disentangled
attention is approximated by `BertTextEncoder` at parity width — its
relative-position attention terms are not reproduced (documented gap;
no flagship config uses it).
"""
from __future__ import annotations

import re
from typing import Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import MODELS
from .text_encoder import CLIPTextEncoder


class _BidirAttention(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x, pad_mask):
        B, L, C = x.shape
        hd = C // self.heads
        q = nn.Dense(C, name='query')(x) * hd ** -0.5
        k = nn.Dense(C, name='key')(x)
        v = nn.Dense(C, name='value')(x)
        split = lambda t: t.reshape(B, L, self.heads, hd).transpose(
            0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum('bhqd,bhkd->bhqk', q, k)
        attn = attn + jnp.where(pad_mask[:, None, None, :], 0.0, -1e9)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        return nn.Dense(C, name='output')(out)


class _BertLayer(nn.Module):
    """Post-LN block (BERT/Roberta encoder layer)."""
    heads: int
    intermediate: int

    @nn.compact
    def __call__(self, x, pad_mask):
        a = _BidirAttention(self.heads, name='attention')(x, pad_mask)
        x = nn.LayerNorm(epsilon=1e-12, name='attention_norm')(x + a)
        h = nn.Dense(self.intermediate, name='intermediate')(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[-1], name='output')(h)
        return nn.LayerNorm(epsilon=1e-12, name='output_norm')(x + h)


@MODELS.register_module()
class BertTextEncoder(nn.Module):
    """HF BertModel-compatible tower (last_hidden_state contract)."""
    vocab_size: int = 30522
    width: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 512
    type_vocab_size: int = 2
    position_offset: int = 0   # Roberta: padding_idx + 1 = 2
    pad_token_id: int = 0

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray) -> jnp.ndarray:
        B, L = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.width,
                       name='word_embeddings')(input_ids)
        pos_emb = self.param('position_embeddings',
                             nn.initializers.normal(0.02),
                             (self.max_positions, self.width))
        if self.position_offset:
            # Roberta: position ids advance only over non-pad tokens,
            # starting at padding_idx+1 (HF create_position_ids_...)
            m = attention_mask.astype(jnp.int32)
            pos_ids = jnp.cumsum(m, axis=1) * m + self.position_offset - 1
            pos = pos_emb[pos_ids]
        else:
            pos = pos_emb[None, :L]
        typ = self.param('token_type_embeddings',
                         nn.initializers.normal(0.02),
                         (self.type_vocab_size, self.width))
        x = tok + pos + typ[0]
        x = nn.LayerNorm(epsilon=1e-12, name='embeddings_norm')(x)
        pad = attention_mask.astype(bool)
        for i in range(self.layers):
            x = _BertLayer(self.heads, self.intermediate,
                           name=f'layer_{i}')(x, pad)
        return x


@MODELS.register_module()
class RobertaTextEncoder(BertTextEncoder):
    """Roberta = BERT body + offset position ids (HF RobertaModel)."""
    vocab_size: int = 50265
    position_offset: int = 2
    max_positions: int = 514
    pad_token_id: int = 1
    type_vocab_size: int = 1


class _T5RMSNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (x.shape[-1], ))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        return x * (var + 1e-6) ** -0.5 * scale


def _t5_relative_bucket(rel_pos, num_buckets=32, max_distance=128):
    """HF T5 bidirectional relative position bucketing."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(np.int32) * num_buckets
    n = np.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(np.int32)
    large = np.minimum(large, num_buckets - 1)
    return ret + np.where(is_small, n, large)


class _T5Layer(nn.Module):
    heads: int
    d_ff: int

    @nn.compact
    def __call__(self, x, pad_mask, pos_bias):
        C = x.shape[-1]
        h = _T5RMSNorm(name='pre_attn_norm')(x)
        B, L, _ = h.shape
        hd = C // self.heads
        q = nn.Dense(C, use_bias=False, name='q')(h)  # T5: no scaling
        k = nn.Dense(C, use_bias=False, name='k')(h)
        v = nn.Dense(C, use_bias=False, name='v')(h)
        split = lambda t: t.reshape(B, L, self.heads, hd).transpose(
            0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum('bhqd,bhkd->bhqk', q, k) + pos_bias
        attn = attn + jnp.where(pad_mask[:, None, None, :], 0.0, -1e9)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        x = x + nn.Dense(C, use_bias=False, name='o')(out)
        h = _T5RMSNorm(name='pre_ff_norm')(x)
        h = nn.Dense(self.d_ff, use_bias=False, name='wi')(h)
        h = nn.relu(h)
        h = nn.Dense(C, use_bias=False, name='wo')(h)
        return x + h


@MODELS.register_module()
class T5TextEncoder(nn.Module):
    """HF T5 encoder stack (T5EncoderModel last_hidden_state)."""
    vocab_size: int = 32128
    width: int = 512
    layers: int = 6
    heads: int = 8
    d_ff: int = 2048
    rel_buckets: int = 32
    rel_max_distance: int = 128

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray) -> jnp.ndarray:
        B, L = input_ids.shape
        x = nn.Embed(self.vocab_size, self.width, name='shared')(input_ids)
        rel = np.arange(L)[None, :] - np.arange(L)[:, None]  # mem - query
        buckets = _t5_relative_bucket(rel, self.rel_buckets,
                                      self.rel_max_distance)
        bias_table = self.param('relative_attention_bias',
                                nn.initializers.normal(0.02),
                                (self.rel_buckets, self.heads))
        pos_bias = bias_table[jnp.asarray(buckets)]       # (L, L, H)
        pos_bias = pos_bias.transpose(2, 0, 1)[None]      # (1, H, L, L)
        pad = attention_mask.astype(bool)
        for i in range(self.layers):
            x = _T5Layer(self.heads, self.d_ff, name=f'layer_{i}')(
                x, pad, pos_bias)
        return _T5RMSNorm(name='final_norm')(x)


# --------------------------------------------------------------------------
# t_type dispatch (reference :131-277)
# --------------------------------------------------------------------------
_CLIP_SIZES = {
    # t_type fragment: (width, layers, heads)
    'clip-vit-base-patch32': (512, 12, 8),
    'clip-vit-base-patch16': (512, 12, 8),
    'clip-vit-large-patch14': (768, 12, 12),
    'clip-vit-large-patch14-336': (768, 12, 12),
    # open_clip towers (same architecture, bigger dims)
    'vit-h-14': (1024, 24, 16),
    'vit-bigg-14': (1280, 32, 20),
    'eva02': (1024, 24, 16),
}


def build_text_encoder(t_type: str = 'clip-vit-large-patch14-336',
                       **overrides) -> Tuple[nn.Module, int]:
    """t_type string → (encoder module, feature width).

    Mirrors the reference's `_init_layers` dispatch; unknown types
    raise with the supported list.
    """
    t = t_type.lower()
    if 'roberta' in t:
        enc = RobertaTextEncoder(**overrides)
        return enc, enc.width
    if 'bert' in t and 'deberta' not in t:
        enc = BertTextEncoder(**overrides)
        return enc, enc.width
    if 'flava' in t or 'deberta' in t:
        # FLAVA's text tower is BERT-architecture; DeBERTa is served at
        # parity width without disentangled attention (see module doc)
        enc = BertTextEncoder(**overrides)
        return enc, enc.width
    if 't5' in t:
        sizes = {'t5-small': (512, 6, 8, 2048),
                 't5-base': (768, 12, 12, 3072),
                 't5-large': (1024, 24, 16, 4096)}
        for k, (w, nl, nh, ff) in sizes.items():
            if k in t:
                overrides.setdefault('width', w)
                overrides.setdefault('layers', nl)
                overrides.setdefault('heads', nh)
                overrides.setdefault('d_ff', ff)
                break
        enc = T5TextEncoder(**overrides)
        return enc, enc.width
    for frag, (w, nl, nh) in sorted(_CLIP_SIZES.items(),
                                    key=lambda kv: -len(kv[0])):
        if frag in t:
            overrides.setdefault('width', w)
            overrides.setdefault('layers', nl)
            overrides.setdefault('heads', nh)
            enc = CLIPTextEncoder(**overrides)
            return enc, enc.width
    if 'clip' in t:
        enc = CLIPTextEncoder(**overrides)
        return enc, enc.width
    raise ValueError(
        f'unknown t_type {t_type!r}; supported: roberta*, bert*, flava*, '
        f'deberta*, t5*, clip*, {sorted(_CLIP_SIZES)}')


# --------------------------------------------------------------------------
# HF weight converters
# --------------------------------------------------------------------------
def convert_hf_bert_text(sd, prefix=''):
    """HF BertModel/RobertaModel state_dict (numpy) → flax params."""
    p = {}

    def put(path, val, transpose=False):
        d = p
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = jnp.asarray(np.asarray(val).T if transpose
                                  else np.asarray(val))

    e = prefix + 'embeddings.'
    put(('word_embeddings', 'embedding'), sd[e + 'word_embeddings.weight'])
    put(('position_embeddings', ), sd[e + 'position_embeddings.weight'])
    put(('token_type_embeddings', ), sd[e + 'token_type_embeddings.weight'])
    put(('embeddings_norm', 'scale'), sd[e + 'LayerNorm.weight'])
    put(('embeddings_norm', 'bias'), sd[e + 'LayerNorm.bias'])
    n_layers = max(
        int(m.group(1)) for k in sd
        if (m := re.search(r'encoder\.layer\.(\d+)\.', k))) + 1
    for i in range(n_layers):
        src = f'{prefix}encoder.layer.{i}.'
        dst = f'layer_{i}'
        for hf, ours in (('attention.self.query', ('attention', 'query')),
                         ('attention.self.key', ('attention', 'key')),
                         ('attention.self.value', ('attention', 'value')),
                         ('attention.output.dense',
                          ('attention', 'output')),
                         ('intermediate.dense', ('intermediate', )),
                         ('output.dense', ('output', ))):
            put((dst, ) + ours + ('kernel', ), sd[src + hf + '.weight'],
                True)
            put((dst, ) + ours + ('bias', ), sd[src + hf + '.bias'])
        put((dst, 'attention_norm', 'scale'),
            sd[src + 'attention.output.LayerNorm.weight'])
        put((dst, 'attention_norm', 'bias'),
            sd[src + 'attention.output.LayerNorm.bias'])
        put((dst, 'output_norm', 'scale'),
            sd[src + 'output.LayerNorm.weight'])
        put((dst, 'output_norm', 'bias'), sd[src + 'output.LayerNorm.bias'])
    return p


def convert_hf_t5_encoder(sd):
    """HF T5EncoderModel state_dict (numpy) → flax params."""
    p = {}

    def put(path, val, transpose=False):
        d = p
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = jnp.asarray(np.asarray(val).T if transpose
                                  else np.asarray(val))

    put(('shared', 'embedding'), sd['shared.weight'])
    put(('relative_attention_bias', ),
        np.asarray(sd['encoder.block.0.layer.0.SelfAttention.'
                      'relative_attention_bias.weight']))
    n_layers = max(
        int(m.group(1)) for k in sd
        if (m := re.search(r'encoder\.block\.(\d+)\.', k))) + 1
    for i in range(n_layers):
        src = f'encoder.block.{i}.layer.'
        dst = f'layer_{i}'
        for w in ('q', 'k', 'v', 'o'):
            put((dst, w, 'kernel'),
                sd[src + f'0.SelfAttention.{w}.weight'], True)
        put((dst, 'pre_attn_norm', 'scale'),
            sd[src + '0.layer_norm.weight'])
        put((dst, 'wi', 'kernel'), sd[src + '1.DenseReluDense.wi.weight'],
            True)
        put((dst, 'wo', 'kernel'), sd[src + '1.DenseReluDense.wo.weight'],
            True)
        put((dst, 'pre_ff_norm', 'scale'), sd[src + '1.layer_norm.weight'])
    put(('final_norm', 'scale'), sd['encoder.final_layer_norm.weight'])
    return p
