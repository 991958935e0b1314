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
    # jitted init: one compiled program instead of ~4 min of per-op
    # eager compiles on this 1-core CPU image
    variables = jax.jit(
        lambda k, b: model.init(k, b, mode='predict'))(
            jax.random.PRNGKey(0), batch)
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


def _np_minkresnet18(params, stats, coords, feats):
    """Independent numpy oracle for the depth-18 sparse backbone in
    eval mode: dict-based sparse convs (coord -> feature), masked
    instance/batch norms from converted affine/running stats, ME
    stride/offset conventions (reference mink_resnet.py:100-144).
    Returns [(stage_coords, stage_feats)] for the 4 stages, coords in
    backbone level units (finest-voxel units / stage stride)."""
    from proxytransformation_tpu.ops.sparse import kernel_offsets
    offs3 = kernel_offsets(3)
    offs2 = kernel_offsets(2)

    def conv(table, out_coords, w, stride):
        out = {}
        k = offs3 if w.shape[0] == 27 else np.zeros((1, 3), int)
        for p in map(tuple, out_coords):
            acc = np.zeros(w.shape[-1], np.float32)
            for ki, off in enumerate(k):
                src = tuple(np.asarray(p) * stride + off)
                if src in table:
                    acc += table[src] @ w[ki]
            out[p] = acc
        return out

    def inorm(table, name):
        p = params[name]
        fs = np.stack(list(table.values()))
        mean, var = fs.mean(0), fs.var(0)
        return {c: (f - mean) / np.sqrt(var + 1e-5) * p['scale'] + p['bias']
                for c, f in table.items()}

    def relu(table):
        return {c: np.maximum(f, 0.0) for c, f in table.items()}

    def downcoords(table):
        return np.unique(np.floor(np.asarray(list(table)) / 2
                                  ).astype(int), axis=0)

    table = {tuple(c): f for c, f in zip(map(tuple, coords), feats)}
    # stem conv1 k3 s2 + instance norm + relu
    table = conv(table, downcoords(table),
                 np.asarray(params['conv1']['kernel']), 2)
    table = relu(inorm(table, 'norm1'))
    # maxpool k2 s2
    pooled = {}
    for p in map(tuple, downcoords(table)):
        cands = [table[tuple(np.asarray(p) * 2 + off)]
                 for off in offs2 if tuple(np.asarray(p) * 2 + off) in table]
        pooled[p] = np.max(np.stack(cands), axis=0)
    table = pooled

    outs = []
    for s in range(1, 5):
        new_coords = downcoords(table)
        for j in range(2):  # depth-18: 2 BasicBlocks per stage
            blk = f'layer{s}_{j}'
            identity = dict(table)
            stride = 2 if j == 0 else 1
            oc = new_coords if j == 0 else np.asarray(list(table))
            x = conv(table, oc, np.asarray(params[blk]['conv1']['kernel']),
                     stride)
            x = relu(bn_sub(params, stats, blk, 'norm1', x))
            x = conv(x, oc, np.asarray(params[blk]['conv2']['kernel']), 1)
            x = bn_sub(params, stats, blk, 'norm2', x)
            if j == 0:
                wd = np.asarray(params[blk]['downsample_conv']['kernel'])
                idn = conv(identity, oc, wd, 2)
                idn = bn_sub(params, stats, blk, 'downsample_norm', idn)
            else:
                idn = identity
            table = {c: np.maximum(x[c] + idn.get(c, 0.0), 0.0) for c in x}
        outs.append((np.asarray(list(table)),
                     np.stack(list(table.values()))))
    return outs


def bn_sub(params, stats, blk, name, table):
    p, s = params[blk][name], stats[blk][name]
    return {c: ((f - np.asarray(s['mean']))
                / np.sqrt(np.asarray(s['var']) + 1e-5)
                * np.asarray(p['scale']) + np.asarray(p['bias']))
            for c, f in table.items()}


def test_parity_backbone3d_level_by_level(tmp_path):
    """Full-backbone replay (backbone_3d.out{i} npz contract) against
    an independent numpy dict-conv oracle of MinkResNet-18 in eval
    mode — proves the harness's coordinate conventions, arch
    inference, and eval-norm semantics before a real dump exists."""
    import torch
    from proxytransformation_tpu.converter.torch_weights import (
        convert_detector, fake_reference_state_dict)
    from proxytransformation_tpu.converter.parity import check_parity

    rng = np.random.RandomState(7)
    sd = fake_reference_state_dict(rng)
    pth = tmp_path / 'fake.pth'
    torch.save({'state_dict': {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, str(pth))
    variables = convert_detector(sd)
    p3 = jax.tree_util.tree_map(np.asarray,
                                variables['params']['backbone_3d'])
    s3 = jax.tree_util.tree_map(np.asarray,
                                variables['batch_stats']['backbone_3d'])

    coords = np.unique(rng.randint(-40, 40, (80, 3)), axis=0)
    feats = rng.randn(len(coords), 3).astype(np.float32) * 0.5
    outs = _np_minkresnet18(p3, s3, coords, feats)

    acts = {
        'backbone_3d.in_coords': np.concatenate(
            [np.zeros((len(coords), 1), int), coords], 1),
        'backbone_3d.in_feats': feats,
    }
    for i, (oc, of) in enumerate(outs):
        stride = 8 * 2 ** i  # conv1 s2 + pool s2 + (i+1) stage strides
        acts[f'backbone_3d.out{i}_coords'] = np.concatenate(
            [np.zeros((len(oc), 1), int), oc * stride], 1)  # ME units
        acts[f'backbone_3d.out{i}_feats'] = of
    npz = tmp_path / 'acts.npz'
    np.savez(str(npz), **acts)

    results = check_parity(str(pth), str(npz), atol=2e-3, report=None)
    by_name = {r[0]: r for r in results}
    for i in range(4):
        name = f'backbone_3d.out{i}'
        assert name in by_name, sorted(by_name)
        assert by_name[name][2], by_name[name]

    # corruption in a deep stage is detected
    bad = dict(np.load(str(npz)))
    bad['backbone_3d.out3_feats'] = bad['backbone_3d.out3_feats'] + 1.0
    np.savez(str(npz), **bad)
    results = check_parity(str(pth), str(npz), atol=2e-3, report=None)
    by_name = {r[0]: r for r in results}
    assert not by_name['backbone_3d.out3'][2]
    assert by_name['backbone_3d.out0'][2]


@pytest.mark.slow
def test_parity_detector_full_forward(tmp_path):
    """detector.* npz contract: the harness reproduces a recorded
    predict-mode forward from the converted checkpoint alone (the
    round trip that runs the moment the released .pth shows up)."""
    import torch
    import __graft_entry__ as g
    from proxytransformation_tpu.converter.torch_weights import (
        fake_reference_state_dict, load_torch_checkpoint)
    from proxytransformation_tpu.converter.parity import check_parity

    rng = np.random.RandomState(0)
    sd = fake_reference_state_dict(
        rng, embed_dim=64, text_blocks=2, img_blocks=2, img_spacial_dim=2,
        input_dim=4 * 32, real_cluster=32, backbone3d_depth=18,
        neck_channels=(64 + 16, 128 + 32, 256 + 64, 512 + 128),
        neck_out=64, decoder_layers=2, dec_embed=64, dec_ffn=256,
        with_backbone2d=True, img_depth=50, img_base=4,
        with_text_encoder=True, text_width=64, text_layers=2)
    pth = tmp_path / 'fake.pth'
    torch.save({'state_dict': {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, str(pth))

    variables = load_torch_checkpoint(str(pth))
    model = g._tiny_model()
    batch = g._tiny_batch(B=1)
    out = model.apply(variables, batch, mode='predict')

    acts = {f'detector.in_{k}': np.asarray(v) for k, v in batch.items()}
    acts['detector.out_bboxes'] = np.asarray(out['bboxes_3d'])
    acts['detector.out_scores'] = np.asarray(out['scores_3d'])
    npz = tmp_path / 'acts.npz'
    np.savez(str(npz), **acts)

    results = check_parity(str(pth), str(npz), atol=1e-4, report=None,
                           detector_builder=g._tiny_model)
    by_name = {r[0]: r for r in results}
    assert 'detector' in by_name, sorted(by_name)
    assert by_name['detector'][2], by_name['detector']

    # without a builder the recorded forward must FAIL loudly,
    # never silently skip
    results = check_parity(str(pth), str(npz), atol=1e-4, report=None)
    by_name = {r[0]: r for r in results}
    assert 'detector' in by_name and not by_name['detector'][2]
