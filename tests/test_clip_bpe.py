"""ClipBPETokenizer exactness vs HF CLIPTokenizer on a local vocab.

The real CLIP vocab blobs are not in this environment, so exactness is
proven structurally: train a BPE vocabulary offline (train_bpe), load
it into BOTH HF's slow CLIPTokenizer and ours, and require identical
input_ids on a fixture corpus (reference tokenization call:
sparse_featfusion_grounder_preshape.py:652-655, padding='longest',
truncation=True).
"""
import numpy as np
import pytest

from proxytransformation_tpu.data.clip_bpe import (ClipBPETokenizer,
                                                   save_vocab, train_bpe)

CORPUS = [
    'the pillow on the left of the bed',
    'a brown wooden chair next to the round table',
    'the lamp between the sofa and the television set',
    'find the backpack under the office desk near the window',
    'the second trash can from the door, behind the refrigerator',
    "it's the mug on the kitchen counter; don't pick the red one",
    'the large painting above the couch, to the right of the shelf',
    'a small plant in the corner of the living room',
]

SENTENCES = [
    'the pillow on the left of the bed',
    "it's the chair near   the WINDOW",   # case + whitespace collapse
    'a plant, behind the door!',
    'unseen zebra words qux',             # byte-fallback path
    # unicode paths of the non-ftfy cleanup (HF BasicTokenizer):
    'café CAFÉ naïve',      # precomposed accents + case
    'café held',                     # NFC composition (e + U+0301)
    '桌子 next to 椅子',   # CJK char spacing
    'ΣΟΦΟΣ sofa',  # Greek final-sigma lowercase
    'İstanbul shelf',                 # 'İ'.lower() expands to 2 chars
    'tab\tand\nnewline  mix',
]


@pytest.fixture(scope='module')
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('clipvocab')
    vocab, merges = train_bpe(CORPUS, n_merges=200)
    save_vocab(vocab, merges, str(d / 'vocab.json'), str(d / 'merges.txt'))
    return d


def test_matches_hf_clip_tokenizer(vocab_dir):
    from transformers.models.clip.tokenization_clip import CLIPTokenizer
    hf = CLIPTokenizer(str(vocab_dir / 'vocab.json'),
                       str(vocab_dir / 'merges.txt'))
    ours = ClipBPETokenizer.from_files(str(vocab_dir / 'vocab.json'),
                                       str(vocab_dir / 'merges.txt'))
    for s in SENTENCES:
        ref = hf.encode(s)  # with special tokens: bos ... eos
        got = ours([s]).input_ids[0].tolist()
        assert got == ref, (s, got, ref)


def test_batch_padding_and_mask(vocab_dir):
    ours = ClipBPETokenizer.from_files(str(vocab_dir / 'vocab.json'),
                                       str(vocab_dir / 'merges.txt'))
    out = ours(SENTENCES)
    assert out.input_ids.shape == out.attention_mask.shape
    lens = out.attention_mask.sum(1)
    assert out.input_ids.shape[1] == lens.max()
    for i, n in enumerate(lens):
        assert out.input_ids[i, 0] == ours.bos_id
        assert out.input_ids[i, n - 1] == ours.eos_id
        assert (out.input_ids[i, n:] == ours.pad_id).all()


def test_char_to_token_spans(vocab_dir):
    ours = ClipBPETokenizer.from_files(str(vocab_dir / 'vocab.json'),
                                       str(vocab_dir / 'merges.txt'))
    text = 'the pillow on the left'
    out = ours([text])
    # every non-space char maps to a token, spaces map to None-or-token
    for ci, ch in enumerate(text):
        t = out.char_to_token(0, ci)
        if ch != ' ':
            assert t is not None and 1 <= t < 77, (ci, ch, t)
    # chars of the same word map to a non-decreasing token range
    toks = [out.char_to_token(0, ci) for ci in range(4, 10)]  # 'pillow'
    assert toks == sorted(toks)


def test_truncation():
    vocab, merges = train_bpe(CORPUS, n_merges=50)
    tok = ClipBPETokenizer(vocab, merges, max_length=8)
    out = tok(['a very long sentence that must surely be truncated here'])
    assert out.input_ids.shape[1] == 8
    assert out.input_ids[0, -1] == tok.eos_id
