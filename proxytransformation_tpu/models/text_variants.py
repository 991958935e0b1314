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
* `DebertaTextEncoder` — DeBERTa v1 with real disentangled attention
  (c2p + p2c relative-position terms against a shared rel_embeddings
  table; covers 'deberta-base/large', HF-parity tested).
* HF CLIP towers reuse `CLIPTextEncoder` (text_encoder.py); open_clip
  towers (ViT-bigG/H-14, EVA02) get `OpenCLIPTextEncoder`, which
  reproduces the reference's monkey-patched token-level encode_text:
  causal-only attention (no pad mask), exact-GELU MLPs, ln_final
  features with no pooling/projection/normalize.

`build_text_encoder(t_type)` mirrors the reference's string dispatch;
HF/open_clip-layout weight converters follow each class.
"""
from __future__ import annotations

import re
from typing import Tuple

import numpy as np
import jax
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
# DeBERTa v1: disentangled attention
# (reference dispatch: sparse_featfusion_grounder_preshape.py:146-148)
# --------------------------------------------------------------------------
class _DisentangledAttention(nn.Module):
    """HF DebertaModel's DisentangledSelfAttention (c2p + p2c).

    Scores = qᵀk/√(3d) + c2p + p2c, where c2p gathers q·pos_key at the
    clamped relative position r = i−j and p2c gathers k·pos_query at −r
    (both projections read the encoder-shared rel_embeddings table).
    """
    heads: int
    max_rel: int = 512

    @nn.compact
    def __call__(self, x, pad_mask, rel_emb):
        B, L, C = x.shape
        hd = C // self.heads
        split = lambda t: t.reshape(*t.shape[:-1], self.heads,
                                    hd).swapaxes(-3, -2)
        q = split(nn.Dense(C, use_bias=False, name='q_proj')(x))
        k = split(nn.Dense(C, use_bias=False, name='k_proj')(x))
        v = split(nn.Dense(C, use_bias=False, name='v_proj')(x))
        q_bias = self.param('q_bias', nn.initializers.zeros, (C, ))
        v_bias = self.param('v_bias', nn.initializers.zeros, (C, ))
        q = q + q_bias.reshape(self.heads, 1, hd)
        v = v + v_bias.reshape(self.heads, 1, hd)

        scale = jnp.sqrt(jnp.float32(hd * 3))  # scale_factor = 1+|{c2p,p2c}|
        q = q / scale
        scores = jnp.einsum('bhqd,bhkd->bhqk', q, k)

        span = min(L, self.max_rel)
        rel_slice = jax.lax.dynamic_slice_in_dim(
            rel_emb, self.max_rel - span, 2 * span, axis=0)  # (2span, C)
        rel = jnp.arange(L)[:, None] - jnp.arange(L)[None, :]  # i - j

        # content→position
        pos_key = split(nn.Dense(C, use_bias=False,
                                 name='pos_proj')(rel_slice)[None])
        c2p = jnp.einsum('bhqd,xhkd->bhqk', q, pos_key)  # (B,H,L,2span)
        c2p_idx = jnp.clip(rel + span, 0, 2 * span - 1)
        c2p = jnp.take_along_axis(
            c2p, jnp.broadcast_to(c2p_idx[None, None], (B, self.heads, L, L)),
            axis=-1)
        # position→content
        pos_q = split(nn.Dense(C, name='pos_q_proj')(rel_slice)[None]) / scale
        p2c = jnp.einsum('bhkd,xhqd->bhkq', k, pos_q)    # (B,H,L,2span)
        p2c_idx = jnp.clip(-rel + span, 0, 2 * span - 1)
        p2c = jnp.take_along_axis(
            p2c, jnp.broadcast_to(p2c_idx[None, None], (B, self.heads, L, L)),
            axis=-1).swapaxes(-1, -2)
        scores = scores + c2p + p2c

        # pads masked along BOTH q and k (HF get_attention_mask)
        m2 = pad_mask[:, None, None, :] & pad_mask[:, None, :, None]
        scores = jnp.where(m2, scores, jnp.finfo(jnp.float32).min)
        probs = nn.softmax(scores, axis=-1)
        out = jnp.einsum('bhqk,bhkd->bhqd', probs, v)
        out = out.swapaxes(1, 2).reshape(B, L, C)
        return nn.Dense(C, name='output')(out)


class _DebertaLayer(nn.Module):
    heads: int
    intermediate: int
    max_rel: int

    @nn.compact
    def __call__(self, x, pad_mask, rel_emb):
        a = _DisentangledAttention(self.heads, self.max_rel,
                                   name='attention')(x, pad_mask, rel_emb)
        x = nn.LayerNorm(epsilon=1e-7, name='attention_norm')(x + a)
        h = nn.Dense(self.intermediate, name='intermediate')(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[-1], name='output')(h)
        return nn.LayerNorm(epsilon=1e-7, name='output_norm')(x + h)


@MODELS.register_module()
class DebertaTextEncoder(nn.Module):
    """HF DebertaModel-compatible tower (v1 disentangled attention).

    Matches microsoft/deberta-base|large: position_biased_input=False
    (word embeddings only, mask-multiplied after LayerNorm), shared
    rel_embeddings table, per-layer c2p+p2c disentangled bias.
    """
    vocab_size: int = 50265
    width: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_rel: int = 512

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray) -> jnp.ndarray:
        x = nn.Embed(self.vocab_size, self.width,
                     name='word_embeddings')(input_ids)
        x = nn.LayerNorm(epsilon=1e-7, name='embeddings_norm')(x)
        pad = attention_mask.astype(bool)
        x = x * pad[..., None].astype(x.dtype)
        rel_emb = self.param('rel_embeddings',
                             nn.initializers.normal(0.02),
                             (2 * self.max_rel, self.width))
        for i in range(self.layers):
            x = _DebertaLayer(self.heads, self.intermediate, self.max_rel,
                              name=f'layer_{i}')(x, pad, rel_emb)
        return x


# --------------------------------------------------------------------------
# open_clip towers (ViT-bigG/H, EVA02): the reference monkey-patches
# encode_text to return ln_final token features with a CAUSAL-ONLY mask
# (no padding mask — it calls text_encoder(input_ids) without the
# attention mask) and exact-GELU MLPs (laion/EVA checkpoints), where the
# HF CLIPTextModel path pads-masks and uses quick_gelu.
# (reference sparse_featfusion_grounder_preshape.py:153-258,657-659)
# --------------------------------------------------------------------------
class _OpenCLIPBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        from .text_encoder import _CLIPAttention
        h = nn.LayerNorm(name='ln_1')(x)
        x = x + _CLIPAttention(self.width, self.heads, name='attn')(h, mask)
        h = nn.LayerNorm(name='ln_2')(x)
        h = nn.Dense(self.width * 4, name='c_fc')(h)
        h = nn.gelu(h, approximate=False)      # torch nn.GELU (exact erf)
        h = nn.Dense(self.width, name='c_proj')(h)
        return x + h


@MODELS.register_module()
class OpenCLIPTextEncoder(nn.Module):
    """open_clip TextTransformer with the reference's token-level patch.

    Returns ln_final(x) per-token features — no pooling, no text
    projection, no normalize (the reference calls forward with the
    default normalize=False). attention_mask is accepted for interface
    parity but deliberately unused: the reference passes only input_ids.
    """
    vocab_size: int = 49408
    width: int = 1024
    layers: int = 24
    heads: int = 16
    max_positions: int = 77

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray = None) -> jnp.ndarray:
        B, L = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.width,
                       name='token_embedding')(input_ids)
        pos = self.param('positional_embedding',
                         nn.initializers.normal(0.01),
                         (self.max_positions, self.width))
        x = tok + pos[None, :L]
        causal = jnp.triu(jnp.full((L, L), -1e9), k=1)[None, None]
        for i in range(self.layers):
            x = _OpenCLIPBlock(self.width, self.heads,
                               name=f'resblock_{i}')(x, causal)
        return nn.LayerNorm(name='ln_final')(x)


# --------------------------------------------------------------------------
_CLIP_SIZES = {
    # t_type fragment: (width, layers, heads)
    'clip-vit-base-patch32': (512, 12, 8),
    'clip-vit-base-patch16': (512, 12, 8),
    'clip-vit-large-patch14': (768, 12, 12),
    'clip-vit-large-patch14-336': (768, 12, 12),
}

_OPEN_CLIP_SIZES = {
    # open_clip text_cfg of each reference t_type (open_clip
    # model_configs/{ViT-bigG-14,ViT-H-14,EVA02-L-14-336,EVA02-E-14-plus})
    'vit-bigg-14': (1280, 32, 20),
    'vit-h-14': (1024, 24, 16),
    'eva02-l-14-336': (768, 12, 12),
    'eva02-e-14-plus': (1280, 32, 20),
}

_DEBERTA_SIZES = {
    'deberta-base': (768, 12, 12, 3072),
    'deberta-large': (1024, 24, 16, 4096),
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
    if 'flava' in t:
        # FLAVA's text tower is BERT-architecture
        enc = BertTextEncoder(**overrides)
        return enc, enc.width
    if 'deberta' in t:
        for k, (w, nl, nh, ff) in _DEBERTA_SIZES.items():
            if k in t:
                overrides.setdefault('width', w)
                overrides.setdefault('layers', nl)
                overrides.setdefault('heads', nh)
                overrides.setdefault('intermediate', ff)
                break
        enc = DebertaTextEncoder(**overrides)
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
    for frag, (w, nl, nh) in sorted(_OPEN_CLIP_SIZES.items(),
                                    key=lambda kv: -len(kv[0])):
        if frag in t:
            overrides.setdefault('width', w)
            overrides.setdefault('layers', nl)
            overrides.setdefault('heads', nh)
            enc = OpenCLIPTextEncoder(**overrides)
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
        f'deberta*, t5*, clip*, '
        f'{sorted(_CLIP_SIZES) + sorted(_OPEN_CLIP_SIZES)}')


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


def convert_open_clip_text(sd):
    """open_clip CLIP/CustomTextCLIP state_dict (numpy) → flax params.

    Handles both layouts: bare text-tower keys (ViT-bigG/H CLIP models)
    and the 'text.'-prefixed CustomTextCLIP layout (EVA02 models). The
    torch nn.MultiheadAttention packed in_proj ([q; k; v] stacked along
    rows) is split into the three flax Dense kernels.
    """
    pre = 'text.' if any(k.startswith('text.token_embedding')
                         for k in sd) else ''
    p = {}

    def put(path, val, transpose=False):
        d = p
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = jnp.asarray(np.asarray(val).T if transpose
                                  else np.asarray(val))

    put(('token_embedding', 'embedding'), sd[pre + 'token_embedding.weight'])
    put(('positional_embedding', ), sd[pre + 'positional_embedding'])
    n_layers = max(
        int(m.group(1)) for k in sd
        if (m := re.search(re.escape(pre) + r'transformer\.resblocks\.(\d+)\.',
                           k))) + 1
    for i in range(n_layers):
        src = f'{pre}transformer.resblocks.{i}.'
        dst = f'resblock_{i}'
        for ln in ('ln_1', 'ln_2'):
            put((dst, ln, 'scale'), sd[src + ln + '.weight'])
            put((dst, ln, 'bias'), sd[src + ln + '.bias'])
        w = np.asarray(sd[src + 'attn.in_proj_weight'])   # (3C, C)
        b = np.asarray(sd[src + 'attn.in_proj_bias'])     # (3C,)
        C = w.shape[1]
        for j, proj in enumerate(('q_proj', 'k_proj', 'v_proj')):
            put((dst, 'attn', proj, 'kernel'), w[j * C:(j + 1) * C], True)
            put((dst, 'attn', proj, 'bias'), b[j * C:(j + 1) * C])
        put((dst, 'attn', 'out_proj', 'kernel'),
            sd[src + 'attn.out_proj.weight'], True)
        put((dst, 'attn', 'out_proj', 'bias'), sd[src + 'attn.out_proj.bias'])
        for fc in ('c_fc', 'c_proj'):
            put((dst, fc, 'kernel'), sd[src + 'mlp.' + fc + '.weight'], True)
            put((dst, fc, 'bias'), sd[src + 'mlp.' + fc + '.bias'])
    put(('ln_final', 'scale'), sd[pre + 'ln_final.weight'])
    put(('ln_final', 'bias'), sd[pre + 'ln_final.bias'])
    return p


def convert_hf_deberta(sd, heads=None):
    """HF DebertaModel state_dict (numpy) → flax params.

    The HF in_proj packs q/k/v INTERLEAVED PER HEAD (transpose_for_scores
    happens before the chunk(3): head i's rows are [3·i·hd, 3·(i+1)·hd)
    split as q/k/v thirds); rows are de-interleaved into the three
    per-tower kernels here. `heads` is needed for the de-interleave;
    standard widths are inferred when omitted.
    """
    p = {}

    def put(path, val, transpose=False):
        d = p
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = jnp.asarray(np.asarray(val).T if transpose
                                  else np.asarray(val))

    put(('word_embeddings', 'embedding'),
        sd['embeddings.word_embeddings.weight'])
    put(('embeddings_norm', 'scale'), sd['embeddings.LayerNorm.weight'])
    put(('embeddings_norm', 'bias'), sd['embeddings.LayerNorm.bias'])
    put(('rel_embeddings', ), sd['encoder.rel_embeddings.weight'])
    n_layers = max(
        int(m.group(1)) for k in sd
        if (m := re.search(r'encoder\.layer\.(\d+)\.', k))) + 1
    C = np.asarray(sd['embeddings.word_embeddings.weight']).shape[1]
    if heads is None:
        heads = {768: 12, 1024: 16, 1536: 24}.get(C)
    if heads is None:
        raise ValueError(f'cannot infer head count for width {C}; '
                         f'pass heads= explicitly')
    hd = C // heads
    for i in range(n_layers):
        src = f'encoder.layer.{i}.'
        dst = f'layer_{i}'
        w = np.asarray(sd[src + 'attention.self.in_proj.weight'])  # (3C, C)
        w = w.reshape(heads, 3, hd, C)
        for j, proj in enumerate(('q_proj', 'k_proj', 'v_proj')):
            put((dst, 'attention', proj, 'kernel'),
                w[:, j].reshape(C, C), True)
        put((dst, 'attention', 'q_bias'), sd[src + 'attention.self.q_bias'])
        put((dst, 'attention', 'v_bias'), sd[src + 'attention.self.v_bias'])
        put((dst, 'attention', 'pos_proj', 'kernel'),
            sd[src + 'attention.self.pos_proj.weight'], True)
        put((dst, 'attention', 'pos_q_proj', 'kernel'),
            sd[src + 'attention.self.pos_q_proj.weight'], True)
        put((dst, 'attention', 'pos_q_proj', 'bias'),
            sd[src + 'attention.self.pos_q_proj.bias'])
        put((dst, 'attention', 'output', 'kernel'),
            sd[src + 'attention.output.dense.weight'], True)
        put((dst, 'attention', 'output', 'bias'),
            sd[src + 'attention.output.dense.bias'])
        put((dst, 'attention_norm', 'scale'),
            sd[src + 'attention.output.LayerNorm.weight'])
        put((dst, 'attention_norm', 'bias'),
            sd[src + 'attention.output.LayerNorm.bias'])
        put((dst, 'intermediate', 'kernel'),
            sd[src + 'intermediate.dense.weight'], True)
        put((dst, 'intermediate', 'bias'), sd[src + 'intermediate.dense.bias'])
        put((dst, 'output', 'kernel'), sd[src + 'output.dense.weight'], True)
        put((dst, 'output', 'bias'), sd[src + 'output.dense.bias'])
        put((dst, 'output_norm', 'scale'),
            sd[src + 'output.LayerNorm.weight'])
        put((dst, 'output_norm', 'bias'), sd[src + 'output.LayerNorm.bias'])
    return p
