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
