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


def test_parity_harness_full_contract(tmp_path):
    """Every module family promised by the parity npz contract has a
    working replay path (VERDICT r2 #5): preshape.simple_encoder,
    preshape.get_offsets, backbone.out{i}, backbone_3d.stem, decoder —
    plus the loud-skip guard for unknown recorded modules."""
    import torch
    from proxytransformation_tpu.converter.torch_weights import (
        fake_reference_state_dict)
    from proxytransformation_tpu.converter.parity import check_parity
    from proxytransformation_tpu.converter import parity as parity_mod

    rng = np.random.RandomState(1)
    sd = fake_reference_state_dict(rng, with_backbone2d=True)
    pth = tmp_path / 'fake.pth'
    torch.save({'state_dict': {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, str(pth))
    from proxytransformation_tpu.converter.torch_weights import (
        convert_detector)
    variables = convert_detector(sd)
    acts = {}

    # --- preshape pointnets: independent numpy oracle (torch conv1x1
    # over the channel axis == x @ W.T + b, BN eval from running stats)
    def bn_eval(x, pre):
        g, b = sd[pre + '.weight'], sd[pre + '.bias']
        m, v = sd[pre + '.running_mean'], sd[pre + '.running_var']
        return (x - m) / np.sqrt(v + 1e-5) * g + b

    b_, m_, k_ = 2, 5, 4
    center = rng.randn(b_, m_, 3).astype(np.float32)
    cluster = rng.randn(b_, m_, k_, 3).astype(np.float32)
    cluster[0, 1, 2] = 0.0  # a padded slot
    rel = cluster - center[:, :, None, :]
    rel[np.all(cluster == 0, -1)] = 0
    x6 = np.concatenate([rel, cluster], -1)

    def pointnet(pre, reduce):
        w0 = sd[f'preshape.{pre}.mlp.0.weight'][..., 0, 0]   # (E, 6)
        h = x6 @ w0.T + sd[f'preshape.{pre}.mlp.0.bias']
        h = np.maximum(bn_eval(h, f'preshape.{pre}.mlp.1'), 0.0)
        return reduce(h)

    acts['preshape.simple_encoder.in0'] = center
    acts['preshape.simple_encoder.in1'] = cluster
    acts['preshape.simple_encoder.out'] = pointnet(
        'simple_encoder', lambda h: h.max(axis=2))
    cm = sd['preshape.get_offsets.channel_mapper.weight'][..., 0]  # (3, E)
    acts['preshape.get_offsets.in0'] = center
    acts['preshape.get_offsets.in1'] = cluster
    acts['preshape.get_offsets.out'] = pointnet(
        'get_offsets', lambda h: h.mean(axis=2)) @ cm.T

    # --- 2D backbone: converted-weight replay (NCHW contract)
    img = rng.randn(1, 3, 32, 32).astype(np.float32)
    acts['backbone.in0'] = img
    outs = parity_mod._replay_backbone(variables, acts)
    for i, o in enumerate(outs):
        acts[f'backbone.out{i}'] = o

    # --- sparse stem: independent numpy dict-conv oracle on a voxel
    # set with negative coords (exercises the even-origin shift)
    nv = 40
    coords = rng.randint(-6, 7, (nv, 3))
    coords = np.unique(coords, axis=0)
    feats = rng.randn(len(coords), 3).astype(np.float32)
    in_c = np.concatenate([np.zeros((len(coords), 1), int), coords], 1)
    table = {tuple(c): f for c, f in zip(map(tuple, coords), feats)}
    w = np.asarray(variables['params']['backbone_3d']['conv1']['kernel'])
    from proxytransformation_tpu.ops.sparse import kernel_offsets
    offs = kernel_offsets(3)
    parents = np.unique(np.floor(coords / 2).astype(int), axis=0)
    out_feats = np.zeros((len(parents), w.shape[-1]), np.float32)
    for pi, p in enumerate(parents):
        for ki, off in enumerate(offs):
            src = tuple(p * 2 + off)
            if src in table:
                out_feats[pi] += table[src] @ w[ki]
    acts['backbone_3d.stem.in_coords'] = in_c
    acts['backbone_3d.stem.in_feats'] = feats
    acts['backbone_3d.stem.out_coords'] = np.concatenate(
        [np.zeros((len(parents), 1), int), parents * 2], 1)  # ME units
    acts['backbone_3d.stem.out_feats'] = out_feats

    # --- decoder: converted-weight replay round-trip
    Q, P, L, De = 4, 12, 6, 16
    acts['decoder.query'] = rng.randn(1, Q, De).astype(np.float32)
    acts['decoder.key'] = rng.randn(1, P, De).astype(np.float32)
    kpm = np.zeros((1, P), bool)
    kpm[0, -2:] = True
    acts['decoder.key_padding_mask'] = kpm
    acts['decoder.query_coords'] = rng.randn(1, Q, 3).astype(np.float32)
    acts['decoder.key_coords'] = rng.randn(1, P, 3).astype(np.float32)
    acts['decoder.pred_bboxes'] = np.concatenate(
        [rng.randn(1, Q, 3), np.abs(rng.randn(1, Q, 3)) + 0.3,
         0.1 * rng.randn(1, Q, 3)], -1).astype(np.float32)
    acts['decoder.text_feats'] = rng.randn(1, L, De).astype(np.float32)
    acts['decoder.text_attention_mask'] = np.zeros((1, L), bool)
    hidden, boxes = parity_mod._replay_decoder(variables, acts)
    acts['decoder.out'] = hidden
    acts['decoder.out_bboxes'] = boxes

    npz = tmp_path / 'acts.npz'
    np.savez(str(npz), **acts)
    results = check_parity(str(pth), str(npz), atol=2e-3, report=None)
    by_name = {r[0]: r for r in results}
    expect = {'preshape.simple_encoder', 'preshape.get_offsets',
              'backbone_3d.stem', 'decoder', 'backbone.out0',
              'backbone.out3'}
    for name in expect:
        assert name in by_name, (name, sorted(by_name))
        assert by_name[name][2], by_name[name]

    # --- loud-skip guard: unknown recorded modules fail the run
    acts['mystery_module.in0'] = np.zeros(3, np.float32)
    acts['mystery_module.out'] = np.zeros(3, np.float32)
    np.savez(str(npz), **acts)
    results = check_parity(str(pth), str(npz), atol=2e-3, report=None)
    skipped = [r for r in results if r[0] == 'mystery_module']
    assert skipped and not skipped[0][2], results
