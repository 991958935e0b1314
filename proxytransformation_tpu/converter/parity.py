"""Activation-parity harness: converted checkpoint vs recorded
reference activations.

The released reference weights are stripped from the snapshot
(/root/reference/.MISSING_LARGE_BLOBS), so numeric parity with the
PyTorch model (BASELINE config #4, `load_from` at reference
configs/grounding/proxy-tiblock33-gs12-wbias-ddr0.6-clip.py:247) cannot
be asserted yet. This harness is the machinery that runs the moment a
`.pth` + activation dump are available:

1. On the PyTorch side (any machine with the reference installed), run
   `record_reference_activations`-style hooks (documented below) to
   save an npz of named per-module inputs/outputs.
2. Here, `check_parity(pth_path, npz_path)` converts the checkpoint
   (converter/torch_weights.py), replays each recorded module input
   through the corresponding flax submodule, and reports per-layer
   max-abs-error against the recorded output.

The npz contract — for each checked module M, arrays
`{M}.in0, {M}.in1, ...` (positional inputs) and `{M}.out`
(`{M}.out{i}` for tuple outputs), except where noted:

  text_feat_map              in0 (B,L,Ct) / out (B,L,256)
  text_encoder               in0 ids (B,L) int / in1 mask / out (B,L,Ct)
  bbox_head.reg_branch       in0 (...,256) / out (...,9)
  preshape.simple_encoder    in0 center (b,m,3) / in1 cluster (b,m,k,3)
                             / out (b,m,C)      (reference :109-142)
  preshape.get_offsets       in0 center / in1 cluster / out (b,m,3)
                             (reference :69-107, pre tanh*margin)
  backbone                   in0 imgs NCHW (B,3,H,W) / out0..3 NCHW
                             (mmdet ResNet50 levels)
  backbone_3d.stem           in_coords (Nv,4) [b,x,y,z] ME level-0
                             coords / in_feats (Nv,3) / out_coords
                             (Mv,4) stride-2 ME coords / out_feats
                             (Mv,64) — output of conv1 BEFORE norm1
                             (reference mink_resnet.py:58-124)
  backbone_3d                full backbone, level by level: in_coords
                             (Nv,4) / in_feats (Nv,3) ME level-0 input,
                             out{i}_coords (Mi,4) / out{i}_feats
                             (Mi,Ci) per returned stage i (ME coords in
                             finest-voxel units, multiples of the stage
                             stride; reference mink_resnet.py:100-144)
  detector.in_{key}          full predict-mode forward: one array per
                             model batch key (points, points_mask,
                             imgs, input_ids, text_mask, proj_mats,
                             views_mask) + detector.out_bboxes (B,Q,9)
                             and detector.out_scores — replayed only
                             when `detector_builder` is passed to
                             check_parity (the flax model config cannot
                             be inferred from the npz alone)
  decoder                    named kwargs (the reference calls it
                             kwargs-only, detector :582-621):
                             decoder.query (B,Q,256), decoder.key,
                             decoder.key_padding_mask (B,P) bool,
                             decoder.query_coords (B,Q,3),
                             decoder.key_coords (B,P,3),
                             decoder.pred_bboxes (B,Q,9),
                             decoder.text_feats (B,L,256),
                             decoder.text_attention_mask (B,L) bool,
                             decoder.out (L,B,Q,256) stacked
                             intermediates, decoder.out_bboxes

Any module recorded in the npz that this harness does NOT know how to
replay is reported as SKIPPED and fails the run — a parity pass must
never silently ignore recorded evidence.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

PYTORCH_RECORDER_SNIPPET = '''
# Run next to the reference repo (PyTorch side) to produce the npz:
import numpy as np, torch
acts = {}
def hook(name):
    def fn(mod, inp, out):
        for i, x in enumerate(inp):
            if torch.is_tensor(x):
                acts[f'{name}.in{i}'] = x.detach().cpu().numpy()
        if torch.is_tensor(out):
            acts[f'{name}.out'] = out.detach().cpu().numpy()
        elif isinstance(out, (tuple, list)):
            for i, x in enumerate(out):
                if torch.is_tensor(x):
                    acts[f'{name}.out{i}'] = x.detach().cpu().numpy()
    return fn
model.text_feat_map.register_forward_hook(hook('text_feat_map'))
model.preshape.simple_encoder.register_forward_hook(
    hook('preshape.simple_encoder'))
model.preshape.get_offsets.register_forward_hook(
    hook('preshape.get_offsets'))
model.bbox_head.reg_branches[0].register_forward_hook(
    hook('bbox_head.reg_branch'))
model.backbone.register_forward_hook(hook('backbone'))

def stem_hook(mod, inp, out):  # ME SparseTensors carry .C / .F
    acts['backbone_3d.stem.in_coords'] = inp[0].C.cpu().numpy()
    acts['backbone_3d.stem.in_feats'] = inp[0].F.detach().cpu().numpy()
    acts['backbone_3d.stem.out_coords'] = out.C.cpu().numpy()
    acts['backbone_3d.stem.out_feats'] = out.F.detach().cpu().numpy()
model.backbone_3d.conv1.register_forward_hook(stem_hook)

def bb3d_hook(mod, inp, out):  # full backbone, per-stage outputs
    acts['backbone_3d.in_coords'] = inp[0].C.cpu().numpy()
    acts['backbone_3d.in_feats'] = inp[0].F.detach().cpu().numpy()
    for i, o in enumerate(out):
        acts[f'backbone_3d.out{i}_coords'] = o.C.cpu().numpy()
        acts[f'backbone_3d.out{i}_feats'] = o.F.detach().cpu().numpy()
model.backbone_3d.register_forward_hook(bb3d_hook)

def dec_hook(mod, args, kwargs, out):  # decoder is called kwargs-only
    for k in ('query', 'key', 'key_padding_mask', 'query_coords',
              'key_coords', 'pred_bboxes', 'text_feats',
              'text_attention_mask'):
        acts[f'decoder.{k}'] = kwargs[k].detach().cpu().numpy()
    acts['decoder.out'] = out[0].detach().cpu().numpy()
    acts['decoder.out_bboxes'] = out[1].detach().cpu().numpy()
model.decoder.register_forward_hook(dec_hook, with_kwargs=True)
# run one batch (model.eval()), then:
np.savez('reference_acts.npz', **acts)
'''

# every npz module prefix check_parity knows how to replay
REPLAYABLE = (
    'text_feat_map', 'bbox_head.reg_branch', 'text_encoder',
    'preshape.simple_encoder', 'preshape.get_offsets', 'backbone',
    'backbone_3d.stem', 'backbone_3d', 'decoder', 'detector',
)


def _max_abs_err(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.max(np.abs(np.asarray(a, np.float32)
                               - np.asarray(b, np.float32))))


def _apply_dense_stack(params: Dict, names, x: np.ndarray,
                       relu_between: bool = True) -> np.ndarray:
    import jax.numpy as jnp
    h = jnp.asarray(x, jnp.float32)
    for i, n in enumerate(names):
        p = params[n]
        h = h @ jnp.asarray(p['kernel'], jnp.float32)
        if 'bias' in p:
            h = h + jnp.asarray(p['bias'], jnp.float32)
        if relu_between and i < len(names) - 1:
            h = jnp.maximum(h, 0.0)
    return np.asarray(h)


def _subvars(variables: Dict, name: str) -> Dict:
    """Extract the {params, batch_stats} subtree of one submodule."""
    out = {}
    for col in ('params', 'batch_stats'):
        tree = variables.get(col, {})
        if name in tree:
            out[col] = tree[name]
    return out


def _module_names(acts) -> List[str]:
    names = set()
    for k in acts.files if hasattr(acts, 'files') else acts.keys():
        base = k
        for suf in ('.in_coords', '.in_feats', '.out_coords', '.out_feats'):
            if base.endswith(suf):
                base = base[:-len(suf)]
                break
        else:
            import re
            m = re.match(r'(.+?)\.(in\d+|out\d*|query|key|'
                         r'key_padding_mask|query_coords|key_coords|'
                         r'pred_bboxes|text_feats|text_attention_mask|'
                         r'out\d+_(?:coords|feats)|'
                         r'in_[a-z0-9_]+|out_[a-z0-9_]+)$', base)
            if m:
                base = m.group(1)
        names.add(base)
    return sorted(names)


def _replay_pointnet(variables, acts, name, cls_kwargs, module_cls):
    """Replay SimplifiedPointNet / OffsetNetwork on recorded
    (center, cluster) inputs (reference preshape :69-142)."""
    import jax.numpy as jnp
    sub = _subvars({'params': variables['params'].get('preshape', {}),
                    'batch_stats':
                    variables.get('batch_stats', {}).get('preshape', {})},
                   name.split('.')[-1])
    mod = module_cls(**cls_kwargs)
    center = jnp.asarray(acts[f'{name}.in0'], jnp.float32)
    cluster = jnp.asarray(acts[f'{name}.in1'], jnp.float32)
    out = mod.apply(sub, center, cluster, False)
    return np.asarray(out)


def _replay_backbone(variables, acts):
    """mmdet ResNet50: NCHW in/out -> our NHWC ResNet."""
    import jax.numpy as jnp
    from ..models.resnet import ResNet
    params = variables['params']['backbone']
    base = params['conv1']['kernel'].shape[-1]
    # infer depth: bottleneck blocks carry conv3; stage-3 block count
    # then separates 50 from 101 (and 18 from 34 for basic blocks)
    bottleneck = 'conv3' in params.get('layer1_0', {})
    n3 = sum(1 for k in params if k.startswith('layer3_'))
    depth = (101 if n3 == 23 else 50) if bottleneck else \
        (34 if n3 == 6 else 18)
    res = ResNet(depth=depth, base_channels=int(base))
    sub = _subvars(variables, 'backbone')
    x = jnp.asarray(acts['backbone.in0'].transpose(0, 2, 3, 1), jnp.float32)
    outs = res.apply(sub, x)
    return [np.asarray(o).transpose(0, 3, 1, 2) for o in outs]


def _replay_stem(variables, acts):
    """Sparse stem conv1 (k3 s2) on a recorded ME voxel set.

    Rebuilds a SparseLevel per batch from the recorded level-0
    coordinates, runs our neighbor-map + gather-GEMM conv with the
    converted conv1 kernel, and compares features at each recorded
    stride-2 output coordinate. Returns (errs, n_missing): recorded
    output voxels absent from our output map count as missing (they
    would indicate a coordinate-map mismatch).
    """
    import jax.numpy as jnp
    from ..ops.sparse import (SparseLevel, linearize, build_neighbor_map,
                              downsample_coords, sparse_conv_apply, SENTINEL)
    in_c = acts['backbone_3d.stem.in_coords'].astype(np.int64)
    in_f = acts['backbone_3d.stem.in_feats'].astype(np.float32)
    out_c = acts['backbone_3d.stem.out_coords'].astype(np.int64)
    out_f = acts['backbone_3d.stem.out_feats'].astype(np.float32)
    w = np.asarray(variables['params']['backbone_3d']['conv1']['kernel'],
                   np.float32)

    bs = sorted(set(in_c[:, 0].tolist()))
    errs, missing = [], 0
    for b in bs:
        ci = in_c[in_c[:, 0] == b, 1:]
        fi = in_f[in_c[:, 0] == b]
        co = out_c[out_c[:, 0] == b, 1:]
        fo = out_f[out_c[:, 0] == b]
        # shift to non-negative with an EVEN origin so floor(c/2)
        # parity matches ME's stride-2 map on negative coords
        origin = (ci.min(axis=0) // 2) * 2
        ci = ci - origin
        co = (co - origin) // 2  # ME strided coords are multiples of 2
        ext = tuple(int(e) for e in np.maximum(ci.max(axis=0) + 2, 4))
        V = ci.shape[0]
        keys = np.asarray(linearize(jnp.asarray(ci, jnp.int32), ext))
        order = np.argsort(keys, kind='stable')
        lvl = SparseLevel(
            keys=jnp.asarray(keys[order][None].astype(np.int32)),
            coords=jnp.asarray(ci[order][None].astype(np.int32)),
            feats=jnp.asarray(fi[order][None]),
            mask=jnp.ones((1, V), bool),
            origin=jnp.zeros((1, 3), jnp.float32),
            extent=ext, stride=1, voxel_size=0.01)
        out_lvl = downsample_coords(lvl, V)
        nbr = build_neighbor_map(lvl, out_lvl, kernel_size=3, stride=2)
        out = sparse_conv_apply(lvl.feats, nbr, jnp.asarray(w),
                                out_lvl.mask)
        ext2 = out_lvl.extent
        our_keys = np.asarray(out_lvl.keys[0])
        our_feats = np.asarray(out[0])
        want = np.asarray(linearize(jnp.asarray(co, jnp.int32), ext2))
        pos = np.searchsorted(our_keys, want)
        pos = np.clip(pos, 0, len(our_keys) - 1)
        hit = our_keys[pos] == want
        missing += int((~hit).sum())
        if hit.any():
            errs.append(_max_abs_err(our_feats[pos[hit]], fo[hit]))
    return (max(errs) if errs else float('inf')), missing


def _infer_backbone3d_arch(params_3d, batch_stats_3d):
    """Depth / block type / norm of the converted MinkResNet from the
    parameter tree alone (mirrors _replay_backbone's inference)."""
    n_per_stage = []
    for s in range(1, 5):
        n = sum(1 for k in params_3d if k.startswith(f'layer{s}_'))
        if n:
            n_per_stage.append(n)
    bottleneck = 'conv3' in params_3d.get('layer1_0', {})
    blocks = tuple(n_per_stage)
    if bottleneck:
        depth = 101 if blocks[2:3] == (23, ) else 50
    else:
        depth = 34 if blocks == (3, 4, 6, 3) else 18
    norm = 'batch' if 'norm1' in (batch_stats_3d or {}) else 'instance'
    return depth, len(n_per_stage), norm


def _replay_backbone3d(variables, acts):
    """Full sparse backbone on a recorded ME voxel set, level by level.

    Rebuilds level 0 per batch from `backbone_3d.in_coords/in_feats`
    (as _replay_stem does), runs the converted MinkResNet in eval mode,
    and compares each returned stage's features at the recorded ME
    coordinates (reference mink_resnet.py:100-144: conv1 s2 + pool s2,
    then stride-2 stages — stage i output coords are multiples of
    2^(2+i) finest-voxel units).

    Returns {stage_name: (max_abs_err, n_missing)}; recorded output
    voxels absent from our coordinate maps count as missing and fail
    the stage (they would mean a coordinate-map mismatch).
    """
    import jax.numpy as jnp
    from ..ops.sparse import SparseLevel, linearize
    from ..models.sparse_resnet import MinkResNet

    in_c = acts['backbone_3d.in_coords'].astype(np.int64)
    in_f = acts['backbone_3d.in_feats'].astype(np.float32)
    params_3d = variables['params']['backbone_3d']
    bstats_3d = variables.get('batch_stats', {}).get('backbone_3d', {})
    depth, num_stages, norm = _infer_backbone3d_arch(params_3d, bstats_3d)

    stages = [i for i in range(num_stages)
              if f'backbone_3d.out{i}_coords' in acts]
    per_stage: Dict[str, List[float]] = {f'backbone_3d.out{i}': []
                                         for i in stages}
    missing = {f'backbone_3d.out{i}': 0 for i in stages}

    for b in sorted(set(in_c[:, 0].tolist())):
        ci = in_c[in_c[:, 0] == b, 1:]
        fi = in_f[in_c[:, 0] == b]
        # even origin: floor(c/2) parity must match ME on negatives,
        # through SIX stride doublings -> align to 64
        origin = (ci.min(axis=0) // 64) * 64
        ci = ci - origin
        ext = tuple(int(e) for e in np.maximum(ci.max(axis=0) + 2, 64))
        V = ci.shape[0]
        # canonical cell format: parity verifies reference numerics,
        # and the brick layout is numerically equivalent only up to
        # f32 summation order (tests/test_brick.py bounds that)
        model = MinkResNet(depth=depth, in_channels=fi.shape[-1],
                           num_stages=num_stages, norm=norm,
                           capacities=(V, ) * 6, brick_stages=())
        keys = np.asarray(linearize(jnp.asarray(ci, jnp.int32), ext))
        order = np.argsort(keys, kind='stable')
        lvl = SparseLevel(
            keys=jnp.asarray(keys[order][None].astype(np.int32)),
            coords=jnp.asarray(ci[order][None].astype(np.int32)),
            feats=jnp.asarray(fi[order][None]),
            mask=jnp.ones((1, V), bool),
            origin=jnp.zeros((1, 3), jnp.float32),
            extent=ext, stride=1, voxel_size=0.01)
        sub = _subvars(variables, 'backbone_3d')
        outs = model.apply(sub, lvl, train=False)
        for i in stages:
            name = f'backbone_3d.out{i}'
            out_lvl = outs[i]
            oc = acts[f'{name}_coords'].astype(np.int64)
            of = acts[f'{name}_feats'].astype(np.float32)
            co = (oc[oc[:, 0] == b, 1:] - origin) // out_lvl.stride
            fo = of[oc[:, 0] == b]
            our_keys = np.asarray(out_lvl.keys[0])
            our_feats = np.asarray(out_lvl.feats[0])
            n_valid = int(np.asarray(out_lvl.mask[0]).sum())
            want = np.asarray(linearize(jnp.asarray(co, jnp.int32),
                                        out_lvl.extent))
            pos = np.clip(np.searchsorted(our_keys[:n_valid], want),
                          0, max(n_valid - 1, 0))
            hit = our_keys[pos] == want if n_valid else \
                np.zeros(len(want), bool)
            missing[name] += int((~hit).sum())
            if hit.any():
                per_stage[name].append(
                    _max_abs_err(our_feats[pos[hit]], fo[hit]))
    return {name: (max(errs) if errs else float('inf'), missing[name])
            for name, errs in per_stage.items()}


def _replay_detector(variables, acts, detector_builder):
    """Full predict-mode forward from recorded batch inputs."""
    import jax.numpy as jnp
    model = detector_builder()
    batch = {}
    keys = acts.files if hasattr(acts, 'files') else acts.keys()
    for k in keys:
        if not k.startswith('detector.in_'):
            continue
        name = k[len('detector.in_'):]
        v = np.asarray(acts[k])
        if v.dtype == np.bool_:
            batch[name] = jnp.asarray(v)
        elif np.issubdtype(v.dtype, np.integer):
            batch[name] = jnp.asarray(v.astype(np.int32))
        else:
            batch[name] = jnp.asarray(v.astype(np.float32))
    out = model.apply(variables, batch, mode='predict')
    return {k2: np.asarray(out[k2]) for k2 in ('bboxes_3d', 'scores_3d')
            if k2 in out}


def _replay_decoder(variables, acts):
    """Full decoder stack + shared reg-branch refinement (reference
    decoder.py:184-317, kwargs recorded per the snippet)."""
    import jax.numpy as jnp
    import flax.linen as nn
    from ..models.decoder import SparseFeatureFusionTransformerDecoder
    from ..models.grounding_head import GroundingHead

    params = variables['params']
    n_layers = sum(1 for k in params['decoder']
                   if k.startswith('layer_'))
    q = jnp.asarray(acts['decoder.query'], jnp.float32)
    embed = q.shape[-1]
    ffn_w = params['decoder']['layer_0']['ffn']['Dense_0']['kernel']
    max_text_len = acts['decoder.text_feats'].shape[1]

    class _Replay(nn.Module):
        @nn.compact
        def __call__(self, query, feats, fpad, qc, kc, pb, tf, tpad):
            head = GroundingHead(num_classes=256, embed_dims=embed,
                                 max_text_len=256,
                                 num_pred_layer=n_layers + 1,
                                 name='bbox_head')
            dec = SparseFeatureFusionTransformerDecoder(
                num_layers=n_layers, embed_dims=embed,
                num_heads=8, feedforward_channels=int(ffn_w.shape[-1]),
                name='decoder')
            return dec(query, feats, fpad, qc, kc, pb, tf, tpad,
                       reg_branch_fn=lambda x, lid=None:
                       head.reg_branches[0](x),
                       bbox_coder_fn=head.bbox_pred_to_bbox,
                       feats_mask=~fpad, query_mask=None,
                       deterministic=True)

    sub = {'params': {'decoder': params['decoder'],
                      'bbox_head': params['bbox_head']}}
    bstats = variables.get('batch_stats', {})
    sub['batch_stats'] = {k: bstats[k] for k in ('decoder', 'bbox_head')
                          if k in bstats}
    hidden, boxes = _Replay().apply(
        sub, q,
        jnp.asarray(acts['decoder.key'], jnp.float32),
        jnp.asarray(acts['decoder.key_padding_mask']).astype(bool),
        jnp.asarray(acts['decoder.query_coords'], jnp.float32),
        jnp.asarray(acts['decoder.key_coords'], jnp.float32),
        jnp.asarray(acts['decoder.pred_bboxes'], jnp.float32),
        jnp.asarray(acts['decoder.text_feats'], jnp.float32),
        jnp.asarray(acts['decoder.text_attention_mask']).astype(bool))
    del max_text_len
    return np.asarray(hidden), np.asarray(boxes)


def check_parity(pth_path: str, npz_path: str,
                 atol: float = 2e-3,
                 convert_kw: Optional[Dict] = None,
                 report: Optional[Callable[[str], None]] = print,
                 detector_builder: Optional[Callable] = None
                 ) -> List[Tuple[str, float, bool]]:
    """Convert `pth_path` and check each recorded activation pair.

    Returns [(module, max_abs_err, ok)] for EVERY module recorded in
    the npz: modules this harness cannot replay are returned with
    err=inf and ok=False (loudly, never silently dropped); raises
    FileNotFoundError if either artifact is missing (callers/tests
    skip in that case). `detector_builder` (a zero-arg callable
    returning the flax detector) enables the full-forward
    `detector.*` replay — without it, recorded detector activations
    count as FAIL, not as silently skipped.
    """
    from .torch_weights import load_torch_checkpoint
    variables = load_torch_checkpoint(pth_path, **(convert_kw or {}))
    acts = np.load(npz_path)
    params = variables['params']
    results: List[Tuple[str, float, bool]] = []
    checked = set()

    def check(name: str, err: float):
        ok = err <= atol
        checked.add(name)
        results.append((name, err, ok))
        if report:
            report(f'{"OK " if ok else "FAIL"} {name}: max|err| = {err:.3e}')

    if 'text_feat_map.in0' in acts:
        out = _apply_dense_stack(params, ['text_feat_map'],
                                 acts['text_feat_map.in0'],
                                 relu_between=False)
        check('text_feat_map', _max_abs_err(out, acts['text_feat_map.out']))

    if 'bbox_head.reg_branch.in0' in acts:
        rb = params['bbox_head']['reg_branch']
        import jax.numpy as jnp
        h = jnp.asarray(acts['bbox_head.reg_branch.in0'], jnp.float32)
        i = 0
        while f'fc{i}' in rb:
            h = jnp.maximum(
                h @ jnp.asarray(rb[f'fc{i}']['kernel'])
                + jnp.asarray(rb[f'fc{i}']['bias']), 0.0)
            i += 1
        h = h @ jnp.asarray(rb['out']['kernel']) + jnp.asarray(
            rb['out']['bias'])
        check('bbox_head.reg_branch',
              _max_abs_err(np.asarray(h), acts['bbox_head.reg_branch.out']))

    if 'text_encoder.in0' in acts:
        from ..models.text_encoder import CLIPTextEncoder
        ids = acts['text_encoder.in0'].astype(np.int32)
        mask = acts.get('text_encoder.in1',
                        np.ones_like(ids)).astype(np.int32)
        width = params['text_encoder']['token_embedding'][
            'embedding'].shape[1]
        n_layers = sum(1 for k in params['text_encoder']
                       if k.startswith('layer_'))
        enc = CLIPTextEncoder(width=width, layers=n_layers,
                              heads=width // 64)
        import jax.numpy as jnp
        out = enc.apply({'params': params['text_encoder']},
                        jnp.asarray(ids), jnp.asarray(mask))
        check('text_encoder',
              _max_abs_err(np.asarray(out), acts['text_encoder.out']))

    if 'preshape.simple_encoder.in0' in acts:
        from ..models.preshape import SimplifiedPointNet
        embed = params['preshape']['simple_encoder']['Dense_0'][
            'kernel'].shape[-1]
        out = _replay_pointnet(variables, acts, 'preshape.simple_encoder',
                               {'out': int(embed)}, SimplifiedPointNet)
        check('preshape.simple_encoder',
              _max_abs_err(out, acts['preshape.simple_encoder.out']))

    if 'preshape.get_offsets.in0' in acts:
        from ..models.preshape import OffsetNetwork
        hidden = params['preshape']['get_offsets']['Dense_0'][
            'kernel'].shape[-1]
        out = _replay_pointnet(variables, acts, 'preshape.get_offsets',
                               {'hidden': int(hidden)}, OffsetNetwork)
        check('preshape.get_offsets',
              _max_abs_err(out, acts['preshape.get_offsets.out']))

    if 'backbone.in0' in acts:
        outs = _replay_backbone(variables, acts)
        for i, o in enumerate(outs):
            key = f'backbone.out{i}'
            if key in acts:
                check(key, _max_abs_err(o, acts[key]))

    if 'backbone_3d.stem.in_coords' in acts:
        err, n_missing = _replay_stem(variables, acts)
        if n_missing and report:
            report(f'backbone_3d.stem: {n_missing} recorded output '
                   'voxels missing from our coordinate map')
        check('backbone_3d.stem',
              err if n_missing == 0 else float('inf'))

    if 'decoder.query' in acts:
        hidden, boxes = _replay_decoder(variables, acts)
        err = _max_abs_err(hidden, acts['decoder.out'])
        if 'decoder.out_bboxes' in acts:
            err = max(err, _max_abs_err(boxes, acts['decoder.out_bboxes']))
        check('decoder', err)

    if 'backbone_3d.in_coords' in acts:
        stage_errs = _replay_backbone3d(variables, acts)
        for name in sorted(stage_errs):
            err, n_missing = stage_errs[name]
            if n_missing and report:
                report(f'{name}: {n_missing} recorded output voxels '
                       'missing from our coordinate map')
            check(name, err if n_missing == 0 else float('inf'))

    if 'detector.out_bboxes' in acts and detector_builder is not None:
        outs_d = _replay_detector(variables, acts, detector_builder)
        err = _max_abs_err(outs_d['bboxes_3d'],
                           acts['detector.out_bboxes'])
        if 'detector.out_scores' in acts and 'scores_3d' in outs_d:
            err = max(err, _max_abs_err(outs_d['scores_3d'],
                                        acts['detector.out_scores']))
        check('detector', err)

    # ---- loud-skip guard: every recorded module must be accounted for
    recorded = set(_module_names(acts))
    # backbone levels are checked under their own out{i} names
    recorded = {('backbone' if r.startswith('backbone.') and
                 not r.startswith('backbone_3d') else r) for r in recorded}
    checked_bases = {('backbone' if c.startswith('backbone.out') else
                      'backbone_3d' if c.startswith('backbone_3d.out')
                      else c) for c in checked}
    for name in sorted(recorded - checked_bases):
        results.append((name, float('inf'), False))
        if report:
            report(f'SKIP {name}: recorded in npz but this harness has '
                   'no replay for it — counted as FAIL')

    return results


def main():
    from argparse import ArgumentParser
    p = ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument('pth', help='reference checkpoint (.pth)')
    p.add_argument('npz', help='recorded activations (.npz)')
    p.add_argument('--atol', type=float, default=2e-3)
    args = p.parse_args()
    results = check_parity(args.pth, args.npz, args.atol)
    bad = [r for r in results if not r[2]]
    print(f'{len(results) - len(bad)}/{len(results)} modules within '
          f'{args.atol}')
    raise SystemExit(1 if bad else 0)


if __name__ == '__main__':
    main()
