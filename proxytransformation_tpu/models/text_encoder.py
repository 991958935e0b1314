"""CLIP-style text encoder in flax + host-side tokenization.

Replaces the reference's frozen HuggingFace `CLIPTextModel`
(t_type='clip-vit-large-patch14-336', reference
models/detectors/sparse_featfusion_grounder_preshape.py:134-136,
configs/...clip.py:24, frozen via lr_mult=0.0 at configs/...clip.py:210).

The transformer matches the HF CLIP text tower: token+position
embeddings, pre-LN blocks with causal+padding attention and
quick-GELU MLPs, final LayerNorm; `last_hidden_state` per-token
features are what the grounder consumes. Weights load from a local
HF/openai checkpoint via `convert_hf_clip_text` when available.

Tokenization is host-side (data pipeline). When the HF CLIP tokenizer
files are present locally they are used; otherwise `HashTokenizer`
provides an offline fallback (whitespace/punct split, stable-hash ids)
that preserves the char→token mapping contract needed for positive
maps (reference :796-856).
"""
from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import MODELS


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class _CLIPAttention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        # mask: (B, 1, L, L) additive
        B, L, C = x.shape
        hd = C // self.heads
        q = nn.Dense(C, name='q_proj')(x) * hd ** -0.5
        k = nn.Dense(C, name='k_proj')(x)
        v = nn.Dense(C, name='v_proj')(x)
        split = lambda t: t.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum('bhqd,bhkd->bhqk', q, k) + mask
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        return nn.Dense(C, name='out_proj')(out)


class _CLIPBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(name='layer_norm1')(x)
        x = x + _CLIPAttention(self.width, self.heads, name='self_attn')(
            h, mask)
        h = nn.LayerNorm(name='layer_norm2')(x)
        h = nn.Dense(self.width * 4, name='fc1')(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, name='fc2')(h)
        return x + h


@MODELS.register_module()
class CLIPTextEncoder(nn.Module):
    """HF CLIPTextModel-compatible text tower (last_hidden_state)."""
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_positions: int = 77

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray) -> jnp.ndarray:
        B, L = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.width,
                       name='token_embedding')(input_ids)
        pos = self.param('position_embedding',
                         nn.initializers.normal(0.01),
                         (self.max_positions, self.width))
        x = tok + pos[None, :L]
        causal = jnp.triu(jnp.full((L, L), -1e9), k=1)
        pad = jnp.where(attention_mask[:, None, None, :], 0.0, -1e9)
        mask = causal[None, None] + pad
        for i in range(self.layers):
            x = _CLIPBlock(self.width, self.heads, name=f'layer_{i}')(x, mask)
        return nn.LayerNorm(name='final_layer_norm')(x)


def convert_hf_clip_text(state_dict):
    """HF CLIPTextModel state_dict (numpy) → flax params."""
    p = {}

    def put(path, val, transpose=False):
        d = p
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = jnp.asarray(val.T if transpose else val)

    pre = 'text_model.'
    put(('token_embedding', 'embedding'),
        state_dict[pre + 'embeddings.token_embedding.weight'])
    put(('position_embedding', ),
        state_dict[pre + 'embeddings.position_embedding.weight'])
    n_layers = max(
        int(m.group(1)) for k in state_dict
        if (m := re.match(re.escape(pre) + r'encoder\.layers\.(\d+)\.', k))
    ) + 1
    for i in range(n_layers):
        src = f'{pre}encoder.layers.{i}.'
        dst = f'layer_{i}'
        for ln in ('layer_norm1', 'layer_norm2'):
            put((dst, ln, 'scale'), state_dict[src + ln + '.weight'])
            put((dst, ln, 'bias'), state_dict[src + ln + '.bias'])
        for proj in ('q_proj', 'k_proj', 'v_proj', 'out_proj'):
            put((dst, 'self_attn', proj, 'kernel'),
                state_dict[src + 'self_attn.' + proj + '.weight'], True)
            put((dst, 'self_attn', proj, 'bias'),
                state_dict[src + 'self_attn.' + proj + '.bias'])
        for fc in ('fc1', 'fc2'):
            put((dst, fc, 'kernel'), state_dict[src + 'mlp.' + fc + '.weight'],
                True)
            put((dst, fc, 'bias'), state_dict[src + 'mlp.' + fc + '.bias'])
    put(('final_layer_norm', 'scale'),
        state_dict[pre + 'final_layer_norm.weight'])
    put(('final_layer_norm', 'bias'),
        state_dict[pre + 'final_layer_norm.bias'])
    return p


# --------------------------------------------------------------------------
# host-side tokenization
# --------------------------------------------------------------------------
class TokenizedBatch:
    """Mirror of the HF BatchEncoding bits the pipeline needs."""

    def __init__(self, input_ids: np.ndarray, attention_mask: np.ndarray,
                 char_maps: List[List[Optional[int]]]):
        self.input_ids = input_ids
        self.attention_mask = attention_mask
        self._char_maps = char_maps

    def char_to_token(self, batch_idx: int, char_idx: int) -> Optional[int]:
        cm = self._char_maps[batch_idx]
        if 0 <= char_idx < len(cm):
            return cm[char_idx]
        return None


class HashTokenizer:
    """Deterministic offline tokenizer (fallback when no HF vocab files).

    Word-level split with stable FNV-1a hashing into the CLIP vocab
    range; BOS/EOS like CLIP. Preserves char→token mapping for
    positive-map construction.
    """
    bos_id = 49406
    eos_id = 49407
    pad_id = 0

    def __init__(self, vocab_size: int = 49408, max_length: int = 77):
        self.vocab_size = vocab_size
        self.max_length = max_length

    @staticmethod
    def _hash(word: str, mod: int) -> int:
        h = 2166136261
        for ch in word.encode('utf-8'):
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        return 1 + h % (mod - 3)  # avoid pad/bos/eos

    def __call__(self, texts: Sequence[str]) -> TokenizedBatch:
        tokenized, char_maps = [], []
        for text in texts:
            ids = [self.bos_id]
            cmap: List[Optional[int]] = [None] * len(text)
            for m in re.finditer(r"\w+|[^\w\s]", text.lower()):
                tid = self._hash(m.group(0), self.vocab_size)
                if len(ids) >= self.max_length - 1:
                    break
                for ci in range(m.start(), m.end()):
                    cmap[ci] = len(ids)
                ids.append(tid)
            ids.append(self.eos_id)
            tokenized.append(ids)
            char_maps.append(cmap)
        L = max(len(t) for t in tokenized)
        input_ids = np.full((len(texts), L), self.pad_id, np.int32)
        attn = np.zeros((len(texts), L), np.int32)
        for i, t in enumerate(tokenized):
            input_ids[i, :len(t)] = t
            attn[i, :len(t)] = 1
        return TokenizedBatch(input_ids, attn, char_maps)


class HFTokenizerWrapper:
    """Wraps a HuggingFace tokenizer loaded from a local path."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer
        self.tok = AutoTokenizer.from_pretrained(path)

    def __call__(self, texts: Sequence[str]) -> TokenizedBatch:
        enc = self.tok.batch_encode_plus(list(texts), padding='longest',
                                         truncation=True, return_tensors='np')
        char_maps = []
        for i, text in enumerate(texts):
            cmap: List[Optional[int]] = []
            for ci in range(len(text)):
                try:
                    cmap.append(enc.char_to_token(i, ci))
                except Exception:
                    cmap.append(None)
            char_maps.append(cmap)
        return TokenizedBatch(np.asarray(enc['input_ids'], np.int32),
                              np.asarray(enc['attention_mask'], np.int32),
                              char_maps)


def build_tokenizer(path: Optional[str] = None):
    """Best available tokenizer for a local path.

    Preference order: our pure-python CLIP BPE (exact, offline — see
    data/clip_bpe.py) when vocab.json+merges.txt exist at `path`, then
    a HF tokenizer loaded from `path`, then the hash fallback.

    Equivalence scope: the BPE engine reproduces HF CLIPTokenizer's
    non-ftfy path exactly (incl. NFC, CJK spacing, final-sigma lower —
    HF-parity tested on unicode inputs); an environment WITH ftfy
    installed differs only on mojibake/ambiguous-encoding inputs.
    """
    if path:
        import os
        vj = os.path.join(path, 'vocab.json')
        mt = os.path.join(path, 'merges.txt')
        if os.path.exists(vj) and os.path.exists(mt):
            try:
                from ..data.clip_bpe import ClipBPETokenizer
                return ClipBPETokenizer.from_files(vj, mt)
            except Exception:
                pass
        try:
            return HFTokenizerWrapper(path)
        except Exception:
            pass
    return HashTokenizer()


def create_positive_map(tokenized: TokenizedBatch,
                        tokens_positive: Sequence[Sequence[Tuple[int, int]]],
                        batch_idx: int,
                        max_text_len: int = 256) -> np.ndarray:
    """Box→token association map (reference :796-847): positive_map[i, j]
    is 1/span for tokens j inside box i's character ranges."""
    positive_map = np.zeros((len(tokens_positive), max_text_len), np.float32)
    for j, tok_list in enumerate(tokens_positive):
        for (beg, end) in tok_list:
            beg_pos = tokenized.char_to_token(batch_idx, beg)
            end_pos = tokenized.char_to_token(batch_idx, end - 1)
            if beg_pos is None:
                beg_pos = (tokenized.char_to_token(batch_idx, beg + 1)
                           or tokenized.char_to_token(batch_idx, beg + 2))
            if end_pos is None:
                end_pos = (tokenized.char_to_token(batch_idx, end - 2)
                           or tokenized.char_to_token(batch_idx, end - 3))
            if beg_pos is None or end_pos is None:
                continue
            positive_map[j, beg_pos:end_pos + 1] = 1.0
    return positive_map / (positive_map.sum(-1, keepdims=True) + 1e-6)
