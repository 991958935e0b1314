"""Whole-detector torch->flax converter round-trip.

The released .pth is stripped from the snapshot, so the test builds a
random state_dict with the reference's exact key layout
(fake_reference_state_dict) and requires that the converted tree is a
STRUCTURAL match for the real detector's init tree on every covered
submodule (same paths, same shapes — any mismatch is a missed or
misshaped mapping), and that the model runs with the merged weights.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from proxytransformation_tpu.converter.torch_weights import (
    convert_detector, fake_reference_state_dict)


def _flatten(tree, pre=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, pre + (k, )))
        else:
            out[pre + (k, )] = tuple(v.shape)
    return out


@pytest.fixture(scope='module')
def model_and_vars():
    import __graft_entry__ as g
    model = g._tiny_model()
    batch = g._tiny_batch(B=1)
    variables = model.init(jax.random.PRNGKey(0), batch, mode='predict')
    return model, batch, variables


@pytest.fixture(scope='module')
def converted():
    # dims must mirror __graft_entry__._tiny_model exactly
    rng = np.random.RandomState(0)
    sd = fake_reference_state_dict(
        rng, embed_dim=64, text_blocks=2, img_blocks=2, img_spacial_dim=2,
        input_dim=4 * 32, real_cluster=32, backbone3d_depth=18,
        neck_channels=(64 + 16, 128 + 32, 256 + 64, 512 + 128),
        neck_out=64, decoder_layers=2, dec_embed=64, dec_ffn=256)
    return convert_detector(sd, backbone3d_depth=18, text_blocks=2,
                            img_blocks=2, decoder_layers=2)


@pytest.mark.parametrize('sub', ['preshape', 'backbone_3d', 'neck_3d',
                                 'decoder', 'bbox_head', 'text_feat_map'])
def test_submodule_structure_and_shapes(model_and_vars, converted, sub):
    _, _, variables = model_and_vars
    ref_p = _flatten(variables['params'][sub])
    got_p = _flatten(converted['params'][sub])
    missing = set(ref_p) - set(got_p)
    extra = set(got_p) - set(ref_p)
    assert not extra, f'{sub}: converter produced unknown paths {extra}'
    assert not missing, f'{sub}: converter missed paths {missing}'
    bad = {k: (ref_p[k], got_p[k]) for k in ref_p if ref_p[k] != got_p[k]}
    assert not bad, f'{sub}: shape mismatches {bad}'


def test_batch_stats_structure(model_and_vars, converted):
    _, _, variables = model_and_vars
    for sub in ('backbone_3d', 'neck_3d', 'decoder', 'preshape'):
        ref = set(_flatten(variables['batch_stats'][sub]))
        got = set(_flatten(converted['batch_stats'][sub]))
        assert ref == got, (sub, ref ^ got)


@pytest.mark.slow
def test_full_apply_with_converted_weights(model_and_vars, converted):
    """Merge the converted tree over init (where shapes match the tiny
    config) and run predict end-to-end."""
    model, batch, variables = model_and_vars

    def merge(dst, src):
        out = {}
        for k, v in dst.items():
            if k in src and isinstance(v, dict):
                out[k] = merge(v, src[k])
            elif k in src and hasattr(src[k], 'shape') \
                    and tuple(src[k].shape) == tuple(v.shape):
                out[k] = src[k]
            else:
                out[k] = v
        return out

    merged = {'params': merge(variables['params'], converted['params']),
              'batch_stats': merge(variables['batch_stats'],
                                   converted['batch_stats'])}
    out = model.apply(merged, batch, mode='predict')
    assert np.isfinite(np.asarray(out['bboxes_3d'])).all()
    assert np.isfinite(np.asarray(out['scores_3d'])).all()


def test_parity_harness_on_fake_checkpoint(tmp_path):
    """The activation-parity harness round-trips a fake .pth + npz."""
    import torch
    from proxytransformation_tpu.converter.torch_weights import (
        fake_reference_state_dict)
    from proxytransformation_tpu.converter.parity import check_parity

    rng = np.random.RandomState(0)
    sd = fake_reference_state_dict(rng)
    pth = tmp_path / 'fake.pth'
    torch.save({'state_dict': {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, str(pth))

    # record "reference" activations with plain numpy (torch Linear:
    # y = x @ W.T + b)
    x = rng.randn(3, 16).astype(np.float32)
    tf_out = x @ sd['text_feat_map.weight'].T + sd['text_feat_map.bias']
    h = x.copy()
    for i in (0, 2):
        h = np.maximum(
            h @ sd[f'bbox_head.reg_branches.0.{i}.weight'].T
            + sd[f'bbox_head.reg_branches.0.{i}.bias'], 0.0)
    rb_out = h @ sd['bbox_head.reg_branches.0.4.weight'].T \
        + sd['bbox_head.reg_branches.0.4.bias']
    npz = tmp_path / 'acts.npz'
    np.savez(str(npz), **{
        'text_feat_map.in0': x, 'text_feat_map.out': tf_out,
        'bbox_head.reg_branch.in0': x, 'bbox_head.reg_branch.out': rb_out,
    })

    results = check_parity(str(pth), str(npz), atol=1e-4, report=None)
    assert len(results) == 2
    assert all(ok for _, _, ok in results), results

    # harness actually detects corruption
    bad = dict(np.load(str(npz)))
    bad['text_feat_map.out'] = bad['text_feat_map.out'] + 0.5
    np.savez(str(npz), **bad)
    results = check_parity(str(pth), str(npz), atol=1e-4, report=None)
    assert not results[0][2]
