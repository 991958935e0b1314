"""Text-encoder zoo: t_type dispatch, forward shapes, HF converters."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from proxytransformation_tpu.models.text_variants import (
    BertTextEncoder, RobertaTextEncoder, T5TextEncoder,
    build_text_encoder, convert_hf_bert_text, convert_hf_t5_encoder)


def _ids(B=2, L=6, vocab=100):
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(3, vocab, (B, L)), jnp.int32)
    mask = jnp.asarray([[1] * L, [1] * (L - 2) + [0, 0]], jnp.int32)
    return ids, mask


@pytest.mark.parametrize('cls,kw', [
    (BertTextEncoder, dict(vocab_size=100, width=32, layers=2, heads=4,
                           intermediate=64, max_positions=16)),
    (RobertaTextEncoder, dict(vocab_size=100, width=32, layers=2, heads=4,
                              intermediate=64, max_positions=16)),
    (T5TextEncoder, dict(vocab_size=100, width=32, layers=2, heads=4,
                         d_ff=64)),
])
def test_variant_forward_shape(cls, kw):
    ids, mask = _ids()
    enc = cls(**kw)
    v = enc.init(jax.random.PRNGKey(0), ids, mask)
    out = enc.apply(v, ids, mask)
    assert out.shape == (2, 6, 32)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_t_type_dispatch():
    for t, cls, width in [('roberta-base', RobertaTextEncoder, 768),
                          ('bert-base-uncased', BertTextEncoder, 768),
                          ('facebook/flava-full', BertTextEncoder, 768),
                          ('t5-base', T5TextEncoder, 768),
                          ('t5-small', T5TextEncoder, 512)]:
        enc, w = build_text_encoder(t)
        assert isinstance(enc, cls) and w == width, t
    enc, w = build_text_encoder('openai/clip-vit-large-patch14-336')
    assert w == 768
    enc, w = build_text_encoder('open_clip ViT-bigG-14')
    assert w == 1280
    with pytest.raises(ValueError, match='unknown t_type'):
        build_text_encoder('word2vec')


def _fake_bert_sd(vocab=100, width=32, layers=2, inter=64, max_pos=16):
    rng = np.random.RandomState(1)
    r = lambda *s: rng.randn(*s).astype(np.float32) * 0.05
    sd = {
        'embeddings.word_embeddings.weight': r(vocab, width),
        'embeddings.position_embeddings.weight': r(max_pos, width),
        'embeddings.token_type_embeddings.weight': r(2, width),
        'embeddings.LayerNorm.weight': 1 + 0.1 * r(width),
        'embeddings.LayerNorm.bias': r(width),
    }
    for i in range(layers):
        p = f'encoder.layer.{i}.'
        for name, o, inp in (('attention.self.query', width, width),
                             ('attention.self.key', width, width),
                             ('attention.self.value', width, width),
                             ('attention.output.dense', width, width),
                             ('intermediate.dense', inter, width),
                             ('output.dense', width, inter)):
            sd[p + name + '.weight'] = r(o, inp)
            sd[p + name + '.bias'] = r(o)
        for ln in ('attention.output.LayerNorm', 'output.LayerNorm'):
            sd[p + ln + '.weight'] = 1 + 0.1 * r(width)
            sd[p + ln + '.bias'] = r(width)
    return sd


def test_bert_converter_round_trip():
    sd = _fake_bert_sd()
    params = convert_hf_bert_text(sd)
    enc = BertTextEncoder(vocab_size=100, width=32, layers=2, heads=4,
                          intermediate=64, max_positions=16)
    ids, mask = _ids()
    out = enc.apply({'params': params}, ids, mask)
    assert out.shape == (2, 6, 32)
    assert bool(jnp.all(jnp.isfinite(out)))
    # converted weights actually land: q kernel matches transposed torch
    np.testing.assert_allclose(
        np.asarray(params['layer_0']['attention']['query']['kernel']),
        sd['encoder.layer.0.attention.self.query.weight'].T)


def test_t5_converter_round_trip():
    rng = np.random.RandomState(2)
    r = lambda *s: rng.randn(*s).astype(np.float32) * 0.05
    vocab, width, layers, ff, heads = 100, 32, 2, 64, 4
    sd = {'shared.weight': r(vocab, width),
          'encoder.block.0.layer.0.SelfAttention.relative_attention_bias'
          '.weight': r(32, heads),
          'encoder.final_layer_norm.weight': 1 + 0.1 * r(width)}
    for i in range(layers):
        p = f'encoder.block.{i}.layer.'
        for w in ('q', 'k', 'v', 'o'):
            sd[p + f'0.SelfAttention.{w}.weight'] = r(width, width)
        sd[p + '0.layer_norm.weight'] = 1 + 0.1 * r(width)
        sd[p + '1.DenseReluDense.wi.weight'] = r(ff, width)
        sd[p + '1.DenseReluDense.wo.weight'] = r(width, ff)
        sd[p + '1.layer_norm.weight'] = 1 + 0.1 * r(width)
    params = convert_hf_t5_encoder(sd)
    enc = T5TextEncoder(vocab_size=vocab, width=width, layers=layers,
                        heads=heads, d_ff=ff)
    ids, mask = _ids()
    out = enc.apply({'params': params}, ids, mask)
    assert out.shape == (2, 6, 32)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_detector_t_type_field():
    """Non-clip t_type builds without error (tiny roberta)."""
    from proxytransformation_tpu.models.detector import (
        SparseFeatureFusion3DGrounderPreshape)
    m = SparseFeatureFusion3DGrounderPreshape(t_type='roberta-base')
    assert m.t_type == 'roberta-base'


# --------------------------------------------------------------------------
# round 3: DeBERTa disentangled attention + open_clip towers
# --------------------------------------------------------------------------
def test_deberta_open_clip_dispatch():
    from proxytransformation_tpu.models.text_variants import (
        DebertaTextEncoder, OpenCLIPTextEncoder)
    for t, w, nl, nh in [('ViT-bigG-14', 1280, 32, 20),
                         ('ViT-H-14', 1024, 24, 16),
                         ('EVA02-L-14-336', 768, 12, 12),
                         ('EVA02-E-14-plus', 1280, 32, 20)]:
        enc, width = build_text_encoder(t)
        assert isinstance(enc, OpenCLIPTextEncoder)
        assert (width, enc.layers, enc.heads) == (w, nl, nh), t
    for t, w, nl in [('deberta-base', 768, 12), ('deberta-large', 1024, 24)]:
        enc, width = build_text_encoder(t)
        assert isinstance(enc, DebertaTextEncoder)
        assert (width, enc.layers) == (w, nl), t


def test_deberta_hf_parity():
    """Tiny random-weight DebertaModel vs our flax tower, exact math."""
    torch = pytest.importorskip('torch')
    transformers = pytest.importorskip('transformers')
    from proxytransformation_tpu.models.text_variants import (
        DebertaTextEncoder, convert_hf_deberta)

    cfg = transformers.DebertaConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16, relative_attention=True,
        max_relative_positions=-1, position_biased_input=False,
        pos_att_type=['c2p', 'p2c'], type_vocab_size=0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.DebertaModel(cfg).eval()

    ids_np = np.random.RandomState(1).randint(3, 100, (2, 7))
    mask_np = np.array([[1] * 7, [1, 1, 1, 1, 1, 0, 0]])
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids_np),
                 attention_mask=torch.tensor(mask_np)
                 ).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_hf_deberta(sd, heads=4)
    enc = DebertaTextEncoder(vocab_size=100, width=32, layers=2, heads=4,
                             intermediate=64, max_rel=16)
    out = enc.apply({'params': params}, jnp.asarray(ids_np),
                    jnp.asarray(mask_np))
    valid = mask_np[..., None].astype(bool)
    np.testing.assert_allclose(np.where(valid, np.asarray(out), 0),
                               np.where(valid, ref, 0), atol=2e-5)


def _torch_open_clip_tower(torch, vocab, width, layers, heads, ctx):
    """Reimplementation of open_clip's text tower with torch MHA —
    same state-dict key layout as open_clip CLIP models."""
    import collections
    nn = torch.nn

    class RB(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(width)
            self.attn = nn.MultiheadAttention(width, heads)
            self.ln_2 = nn.LayerNorm(width)
            self.mlp = nn.Sequential(collections.OrderedDict([
                ('c_fc', nn.Linear(width, width * 4)),
                ('gelu', nn.GELU()),
                ('c_proj', nn.Linear(width * 4, width))]))

        def forward(self, x, attn_mask):
            a, _ = self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x),
                             need_weights=False, attn_mask=attn_mask)
            x = x + a
            return x + self.mlp(self.ln_2(x))

    class Tower(nn.Module):
        def __init__(self):
            super().__init__()
            self.token_embedding = nn.Embedding(vocab, width)
            self.positional_embedding = nn.Parameter(
                0.01 * torch.randn(ctx, width))
            self.transformer = nn.Module()
            self.transformer.resblocks = nn.ModuleList(
                [RB() for _ in range(layers)])
            self.ln_final = nn.LayerNorm(width)

        def forward(self, ids):
            L = ids.shape[1]
            x = self.token_embedding(ids) + self.positional_embedding[:L]
            x = x.permute(1, 0, 2)
            m = torch.triu(torch.full((L, L), float('-inf')), 1)
            for rb in self.transformer.resblocks:
                x = rb(x, m)
            return self.ln_final(x.permute(1, 0, 2))

    return Tower()


@pytest.mark.parametrize('prefix', ['', 'text.'])
def test_open_clip_converter_parity(prefix):
    """Our OpenCLIPTextEncoder == torch-MHA open_clip tower, both key
    layouts (bare CLIP and CustomTextCLIP 'text.'-prefixed)."""
    torch = pytest.importorskip('torch')
    from proxytransformation_tpu.models.text_variants import (
        OpenCLIPTextEncoder, convert_open_clip_text)

    torch.manual_seed(0)
    tower = _torch_open_clip_tower(torch, vocab=100, width=32, layers=2,
                                   heads=4, ctx=12).eval()
    ids_np = np.random.RandomState(2).randint(0, 100, (2, 9))
    with torch.no_grad():
        ref = tower(torch.tensor(ids_np)).numpy()

    sd = {prefix + k: v.numpy() for k, v in tower.state_dict().items()}
    params = convert_open_clip_text(sd)
    enc = OpenCLIPTextEncoder(vocab_size=100, width=32, layers=2, heads=4,
                              max_positions=12)
    out = enc.apply({'params': params}, jnp.asarray(ids_np))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
