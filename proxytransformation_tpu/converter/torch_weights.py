"""PyTorch→flax checkpoint converter for the full grounder.

Maps the reference detector's torch state_dict (layout read from
/root/reference/embodiedscan/models/detectors/
sparse_featfusion_grounder_preshape.py:87-124 and its submodules) onto
this repo's flax variable tree:

    backbone.*       mmdet ResNet50        -> models/resnet.py
    text_encoder.*   HF CLIPTextModel      -> models/text_encoder.py
    text_feat_map.*  nn.Linear             -> Dense
    preshape.*       ProxyTransformationNormReverse
                     (preshape_norm_reverse_drop.py:22-672)
    backbone_3d.*    ME MinkResNet         -> models/sparse_resnet.py
    neck_3d.*        ME MinkNeck           -> models/sparse_neck.py
    decoder.*        ground_transformer    -> models/decoder.py
    bbox_head.*      GroundingHead         -> models/grounding_head.py

The released .pth blobs are stripped from the snapshot, so exactness is
proven structurally: `fake_reference_state_dict` builds a random
state_dict with the reference's exact key names/shapes for a given tiny
config, and tests round-trip it through `convert_detector` into a real
model apply (tests/test_torch_convert.py). When real weights appear,
`load_torch_checkpoint` is the entry point.

Conventions: torch Linear (out,in) -> flax kernel (in,out); Conv2d 1x1
(out,in,1,1) and Conv1d k1 (out,in,1) -> Dense; Conv2d 7x7 OIHW ->
HWIO; BN weight/bias/running_* -> scale/bias + batch_stats mean/var;
LayerNorm weight -> scale; nn.MultiheadAttention in_proj_weight (3E,E)
-> q/k/v kernels; ME conv kernel (K^3, C_in, C_out) -> unchanged.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _put(tree, path, val):
    d = tree
    for k in path[:-1]:
        d = d.setdefault(k, {})
    d[path[-1]] = jnp.asarray(np.asarray(val))


def _merge(dst, src):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


class _Ctx:
    """Collects params + batch_stats under a torch key prefix."""

    def __init__(self, sd, params, stats, prefix=''):
        self.sd = sd
        self.params = params
        self.stats = stats
        self.prefix = prefix

    def get(self, key):
        return np.asarray(self.sd[self.prefix + key])

    def has(self, key):
        return (self.prefix + key) in self.sd

    def linear(self, dst, src, bias=True):
        _put(self.params, dst + ('kernel', ), self.get(src + '.weight').T)
        if bias and self.has(src + '.bias'):
            _put(self.params, dst + ('bias', ), self.get(src + '.bias'))

    def conv1x1(self, dst, src, bias=True):
        w = self.get(src + '.weight')   # (out, in, 1[,1])
        w = w.reshape(w.shape[0], w.shape[1])
        _put(self.params, dst + ('kernel', ), w.T)
        if bias and self.has(src + '.bias'):
            _put(self.params, dst + ('bias', ), self.get(src + '.bias'))

    def ln(self, dst, src):
        _put(self.params, dst + ('scale', ), self.get(src + '.weight'))
        _put(self.params, dst + ('bias', ), self.get(src + '.bias'))

    def bn(self, dst, src):
        self.ln(dst, src)
        _put(self.stats, dst + ('mean', ), self.get(src + '.running_mean'))
        _put(self.stats, dst + ('var', ), self.get(src + '.running_var'))

    def me_conv(self, dst, src, bias=False):
        k = self.get(src + '.kernel')
        if k.ndim == 2:                 # 1x1 ME conv: (C_in, C_out)
            k = k[None]
        _put(self.params, dst + ('kernel', ), k)
        if bias and self.has(src + '.bias'):
            _put(self.params, dst + ('bias', ), self.get(src + '.bias'))

    def me_bn(self, dst, src):
        self.bn(dst, src + '.bn')

    def mha(self, dst, src):
        """torch nn.MultiheadAttention -> q/k/v/out Dense."""
        w = self.get(src + '.in_proj_weight')        # (3E, E)
        b = self.get(src + '.in_proj_bias')
        E = w.shape[1]
        for i, name in enumerate(('q_proj', 'k_proj', 'v_proj')):
            _put(self.params, dst + (name, 'kernel'),
                 w[i * E:(i + 1) * E].T)
            _put(self.params, dst + (name, 'bias'), b[i * E:(i + 1) * E])
        self.linear(dst + ('out_proj', ), src + '.out_proj')


# --------------------------------------------------------------------------
# submodule converters
# --------------------------------------------------------------------------
def convert_preshape(sd, prefix='preshape.', text_blocks=3, img_blocks=3):
    """preshape_norm_reverse_drop.py:22-672 -> models/preshape.py."""
    params, stats = {}, {}
    c = _Ctx(sd, params, stats, prefix)

    # OffsetNetwork: mlp.0 Conv2d(6,E,1) + mlp.1 BN2d; channel_mapper
    # Conv1d(E,3,1,bias=False)  (reference :69-107)
    c.conv1x1(('get_offsets', 'Dense_0'), 'get_offsets.mlp.0')
    c.bn(('get_offsets', 'BatchNorm_0'), 'get_offsets.mlp.1')
    c.conv1x1(('get_offsets', 'Dense_1'), 'get_offsets.channel_mapper')
    # SimplifiedPointNet: mlp.0 Conv2d + mlp.1 BN2d (reference :109-142)
    c.conv1x1(('simple_encoder', 'Dense_0'), 'simple_encoder.mlp.0')
    c.bn(('simple_encoder', 'BatchNorm_0'), 'simple_encoder.mlp.1')
    # img proxy tower (reference :304-306, 144-177)
    c.conv1x1(('channel_mapper', ), 'channel_mapper')
    _put(params, ('attn_pool2d', 'positional_embedding'),
         c.get('attn_pool2d.positional_embedding'))
    for p in ('q_proj', 'k_proj', 'v_proj', 'c_proj'):
        c.linear(('attn_pool2d', p), f'attn_pool2d.{p}')
    c.ln(('norm_img', ), 'norm_img')

    def block(dst, src):
        c.ln((dst, 'norm1'), src + '.norm1')
        c.ln((dst, 'norm2'), src + '.norm2')
        c.linear((dst, 'attn', 'qkv'), src + '.attn.qkv', bias=False)
        if c.has(src + '.attn.qkv.bias'):
            _put(params, (dst, 'attn', 'qkv', 'bias'),
                 c.get(src + '.attn.qkv.bias'))
        c.linear((dst, 'attn', 'proxy_proj'), src + '.attn.proxy_proj')
        c.linear((dst, 'attn', 'proj'), src + '.attn.proj')
        for b in ('pb_bias', 'pc_bias', 'pr_bias'):
            _put(params, (dst, 'attn', b), c.get(f'{src}.attn.{b}'))
        c.linear((dst, 'mlp', 'Dense_0'), src + '.mlp.fc1')
        c.linear((dst, 'mlp', 'Dense_1'), src + '.mlp.fc2')

    for i in range(text_blocks):
        block(f'textformer_{i}', f'textformer.{i}')
        c.ln((f'text_norm_{i}', ), f'text_norm.{i}')
    for i in range(img_blocks):
        block(f'imgformer_{i}', f'imgformer.{i}')
        c.ln((f'img_norm_{i}', ), f'img_norm.{i}')

    c.linear(('text_trans', ), 'text_trans')
    c.linear(('img_trans', ), 'img_trans')
    c.bn(('text_trans_norm', ), 'text_trans_norm')
    c.bn(('img_trans_norm', ), 'img_trans_norm')
    return params, stats


def convert_mink_resnet(sd, prefix='backbone_3d.', depth=34):
    """mink_resnet.py:20-144 (ME modules) -> models/sparse_resnet.py."""
    from ..models.sparse_resnet import MinkResNet
    params, stats = {}, {}
    c = _Ctx(sd, params, stats, prefix)
    block_type, arch = MinkResNet.arch_settings[depth]
    c.me_conv(('conv1', ), 'conv1')
    if c.has('norm1.bn.weight'):            # BATCHNORM=1 variant
        c.me_bn(('norm1', ), 'norm1')
    elif c.has('norm1.weight'):             # InstanceNorm affine
        c.ln(('norm1', ), 'norm1')
    n_convs = 3 if block_type == 'bottleneck' else 2
    for i, n_blocks in enumerate(arch):
        for j in range(n_blocks):
            src = f'layer{i + 1}.{j}'
            dst = f'layer{i + 1}_{j}'
            for k in range(1, n_convs + 1):
                c.me_conv((dst, f'conv{k}'), f'{src}.conv{k}')
                c.me_bn((dst, f'norm{k}'), f'{src}.norm{k}')
            if c.has(f'{src}.downsample.0.kernel'):
                c.me_conv((dst, 'downsample_conv'), f'{src}.downsample.0')
                c.me_bn((dst, 'downsample_norm'), f'{src}.downsample.1')
    return params, stats


def convert_mink_neck(sd, prefix='neck_3d.', n_levels=4):
    """mink_neck.py:20-245 -> models/sparse_neck.py.

    Reference blocks are Sequentials: up_block_i = [GenerativeTranspose,
    BN, ELU, Conv3, BN, ELU]; out_block_i = [Conv3, BN, ELU].
    """
    params, stats = {}, {}
    c = _Ctx(sd, params, stats, prefix)
    for i in range(1, n_levels):
        dst = f'up_block_{i}'
        _put(params, (dst, 'transpose_kernel'),
             c.get(f'up_block_{i}.0.kernel'))
        c.me_bn((dst, 'norm1'), f'up_block_{i}.1')
        c.me_conv((dst, 'conv'), f'up_block_{i}.3')
        c.me_bn((dst, 'norm2'), f'up_block_{i}.4')
    for i in range(n_levels):
        dst = f'out_block_{i}'
        c.me_conv((dst, 'conv'), f'out_block_{i}.0')
        c.me_bn((dst, 'norm'), f'out_block_{i}.1')
    # conv_cls: 1x1 ME conv with bias -> Dense
    k = c.get('conv_cls.kernel')
    k = k.reshape(k.shape[-2], k.shape[-1])
    _put(params, ('conv_cls', 'kernel'), k)
    _put(params, ('conv_cls', 'bias'), c.get('conv_cls.bias'))
    return params, stats


def convert_decoder(sd, prefix='decoder.', num_layers=6):
    """ground_transformer/decoder.py:22-317 -> models/decoder.py."""
    params, stats = {}, {}
    c = _Ctx(sd, params, stats, prefix)

    def posembed(dst, src):
        c.conv1x1((dst, 'conv1'), src + '.position_embedding_head.0')
        c.bn((dst, 'bn'), src + '.position_embedding_head.1')
        c.conv1x1((dst, 'conv2'), src + '.position_embedding_head.3')

    posembed('self_posembed', 'self_posembed')
    posembed('cross_posembed', 'cross_posembed')
    c.ln(('norm', ), 'norm')
    for i in range(num_layers):
        src = f'layers.{i}'
        dst = f'layer_{i}'
        for attn in ('self_attn', 'cross_attn_text', 'cross_attn'):
            c.mha((dst, attn), f'{src}.{attn}.attn')
        for n in range(4):
            c.ln((dst, f'norm{n}'), f'{src}.norms.{n}')
        c.linear((dst, 'ffn', 'Dense_0'), f'{src}.ffn.layers.0.0')
        c.linear((dst, 'ffn', 'Dense_1'), f'{src}.ffn.layers.1')
    return params, stats


def convert_grounding_head(sd, prefix='bbox_head.', num_reg_fcs=2):
    """grounding_head.py:22-849 -> models/grounding_head.py.

    share_pred_layer=True in the flagship config, so branch index 0
    holds the (shared) weights.
    """
    params, stats = {}, {}
    c = _Ctx(sd, params, stats, prefix)
    if c.has('cls_branches.0.log_scale'):
        _put(params, ('cls_branch', 'log_scale'),
             c.get('cls_branches.0.log_scale'))
    if c.has('cls_branches.0.bias'):
        _put(params, ('cls_branch', 'bias_value'),
             c.get('cls_branches.0.bias'))
    # reg branch Sequential: Linear,ReLU x num_reg_fcs then final Linear
    for f in range(num_reg_fcs):
        c.linear(('reg_branch', f'fc{f}'), f'reg_branches.0.{2 * f}')
    c.linear(('reg_branch', 'out'), f'reg_branches.0.{2 * num_reg_fcs}')
    return params, stats


# --------------------------------------------------------------------------
# full detector
# --------------------------------------------------------------------------
def _count_indexed(sd, pattern: str) -> int:
    import re
    idxs = [int(m.group(1)) for k in sd
            if (m := re.match(pattern, k)) is not None]
    return max(idxs) + 1 if idxs else 0


def convert_detector(sd: Dict[str, np.ndarray],
                     img_depth: int = 50,
                     backbone3d_depth: int = 34,
                     text_blocks: int = 3,
                     img_blocks: int = 3,
                     decoder_layers: int = 6,
                     n_neck_levels: int = 4) -> Dict:
    """Reference grounder state_dict -> flax {'params', 'batch_stats'}.

    Block/layer counts are inferred from the state-dict keys when
    present (so tiny test checkpoints and the released weights both
    convert without hand-set kwargs); the explicit arguments remain as
    fallbacks for partial dicts.
    """
    from ..models.resnet import convert_torch_resnet
    from ..models.sparse_resnet import MinkResNet
    from ..models.text_encoder import convert_hf_clip_text

    text_blocks = _count_indexed(
        sd, r'preshape\.textformer\.(\d+)\.') or text_blocks
    img_blocks = _count_indexed(
        sd, r'preshape\.imgformer\.(\d+)\.') or img_blocks
    decoder_layers = _count_indexed(
        sd, r'decoder\.layers\.(\d+)\.') or decoder_layers
    n_neck_levels = _count_indexed(
        sd, r'neck_3d\.out_block_(\d+)\.') or n_neck_levels
    # infer MinkResNet depth by matching per-stage block counts
    stage_blocks = tuple(
        _count_indexed(sd, rf'backbone_3d\.layer{s}\.(\d+)\.')
        for s in range(1, 5))
    if any(stage_blocks):
        for depth, (_, arch) in MinkResNet.arch_settings.items():
            if tuple(arch) == stage_blocks:
                backbone3d_depth = depth
                break

    params: Dict = {}
    stats: Dict = {}

    bsd = {k[len('backbone.'):]: np.asarray(v) for k, v in sd.items()
           if k.startswith('backbone.')}
    if bsd:
        # infer 2D depth: bottlenecks carry conv3, stage-3 block count
        # separates 50/101 (and 18/34 for basic blocks)
        if any(k.startswith('layer') for k in bsd):
            bottleneck = 'layer1.0.conv3.weight' in bsd
            n3 = _count_indexed(bsd, r'layer3\.(\d+)\.')
            img_depth = ((101 if n3 == 23 else 50) if bottleneck else
                         (34 if n3 == 6 else 18))
        bp, bs = convert_torch_resnet(bsd, depth=img_depth)
        params['backbone'] = bp
        stats['backbone'] = bs

    te = {k[len('text_encoder.'):]: np.asarray(v) for k, v in sd.items()
          if k.startswith('text_encoder.')}
    if te:
        params['text_encoder'] = convert_hf_clip_text(te)

    c = _Ctx(sd, params, stats, '')
    if c.has('text_feat_map.weight'):
        c.linear(('text_feat_map', ), 'text_feat_map')

    for name, (p, s) in (
            ('preshape', convert_preshape(sd, 'preshape.', text_blocks,
                                          img_blocks)),
            ('backbone_3d', convert_mink_resnet(sd, 'backbone_3d.',
                                                backbone3d_depth)),
            ('neck_3d', convert_mink_neck(sd, 'neck_3d.', n_neck_levels)),
            ('decoder', convert_decoder(sd, 'decoder.', decoder_layers)),
            ('bbox_head', convert_grounding_head(sd, 'bbox_head.')),
    ):
        params[name] = p
        if s:
            stats[name] = s

    return {'params': params, 'batch_stats': stats}


def load_torch_checkpoint(path: str, **kw) -> Dict:
    """Load a reference .pth (torch cpu) and convert.

    Accepts mmengine-style checkpoints ({'state_dict': ...}) and plain
    state dicts; strips a leading 'module.' (DDP) if present.
    Entry point for the released weights
    (reference configs/grounding/proxy-...clip.py:247 `load_from`).
    """
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k[len('module.'):] if k.startswith('module.') else k:
          v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
          for k, v in sd.items()}
    return convert_detector(sd, **kw)


# --------------------------------------------------------------------------
# synthetic reference-layout state dict (for tests; blobs are stripped
# from the snapshot so the converter must be verifiable without them)
# --------------------------------------------------------------------------
def fake_reference_state_dict(rng: np.random.RandomState,
                              embed_dim: int = 16,
                              num_heads: int = 4,
                              text_blocks: int = 1,
                              img_blocks: int = 1,
                              img_spacial_dim: int = 2,
                              input_dim: int = 8,
                              real_cluster: int = 4,
                              backbone3d_depth: int = 18,
                              backbone3d_in: int = 3,
                              neck_channels: Sequence[int] = (8, 16, 24, 32),
                              neck_out: int = 16,
                              decoder_layers: int = 2,
                              dec_embed: int = 16,
                              dec_ffn: int = 32,
                              num_reg: int = 9,
                              with_backbone2d: bool = False,
                              img_depth: int = 18,
                              img_base: int = 8,
                              with_text_encoder: bool = False,
                              text_width: int = 16,
                              text_layers: int = 2,
                              text_vocab: int = 49408,
                              text_ctx: int = 77) -> Dict[str, np.ndarray]:
    """Random tensors under the reference's exact key names/shapes."""
    sd: Dict[str, np.ndarray] = {}

    def r(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.05

    def lin(pre, i, o, bias=True):
        sd[pre + '.weight'] = r(o, i)
        if bias:
            sd[pre + '.bias'] = r(o)

    def bn(pre, ch):
        sd[pre + '.weight'] = 1 + 0.1 * r(ch)
        sd[pre + '.bias'] = r(ch)
        sd[pre + '.running_mean'] = 0.1 * r(ch)
        sd[pre + '.running_var'] = np.abs(1 + 0.1 * r(ch))

    def ln(pre, ch):
        sd[pre + '.weight'] = 1 + 0.1 * r(ch)
        sd[pre + '.bias'] = r(ch)

    E = embed_dim
    # ---- preshape
    p = 'preshape.'
    sd[p + 'get_offsets.mlp.0.weight'] = r(E, 6, 1, 1)
    sd[p + 'get_offsets.mlp.0.bias'] = r(E)
    bn(p + 'get_offsets.mlp.1', E)
    sd[p + 'get_offsets.channel_mapper.weight'] = r(3, E, 1)
    sd[p + 'simple_encoder.mlp.0.weight'] = r(E, 6, 1, 1)
    sd[p + 'simple_encoder.mlp.0.bias'] = r(E)
    bn(p + 'simple_encoder.mlp.1', E)
    sd[p + 'channel_mapper.weight'] = r(E, input_dim, 1, 1)
    sd[p + 'channel_mapper.bias'] = r(E)
    sd[p + 'attn_pool2d.positional_embedding'] = r(
        img_spacial_dim ** 2 + 1, E)
    for proj in ('q_proj', 'k_proj', 'v_proj', 'c_proj'):
        lin(p + f'attn_pool2d.{proj}', E, E)
    ln(p + 'norm_img', E)
    s = int(E ** 0.5)
    rc = real_cluster  # num_cluster * (1 - dynamic_drop_radio)

    def proxy_block(pre):
        ln(pre + '.norm1', E)
        ln(pre + '.norm2', E)
        sd[pre + '.attn.qkv.weight'] = r(3 * E, E)
        lin(pre + '.attn.proxy_proj', E, E)
        lin(pre + '.attn.proj', E, E)
        sd[pre + '.attn.pb_bias'] = r(1, rc, 4, 4)
        sd[pre + '.attn.pc_bias'] = r(1, rc, s, 1)
        sd[pre + '.attn.pr_bias'] = r(1, rc, 1, s)
        lin(pre + '.mlp.fc1', E, 4 * E)
        lin(pre + '.mlp.fc2', 4 * E, E)

    for i in range(text_blocks):
        proxy_block(p + f'textformer.{i}')
        ln(p + f'text_norm.{i}', E)
    for i in range(img_blocks):
        proxy_block(p + f'imgformer.{i}')
        ln(p + f'img_norm.{i}', E)
    lin(p + 'text_trans', E, 3)
    lin(p + 'img_trans', E, 9)
    bn(p + 'text_trans_norm', 3)
    bn(p + 'img_trans_norm', 9)

    # ---- backbone_3d (ME MinkResNet, BasicBlock)
    from ..models.sparse_resnet import MinkResNet
    _, arch = MinkResNet.arch_settings[backbone3d_depth]
    b = 'backbone_3d.'
    sd[b + 'conv1.kernel'] = r(27, backbone3d_in, 64)
    ln(b + 'norm1', 64)  # stem InstanceNorm affine
    inpl = 64
    for i, n_blocks in enumerate(arch):
        planes = 64 * 2 ** i
        for j in range(n_blocks):
            src = b + f'layer{i + 1}.{j}'
            cin = inpl if j == 0 else planes
            sd[src + '.conv1.kernel'] = r(27, cin, planes)
            bn(src + '.norm1.bn', planes)
            sd[src + '.conv2.kernel'] = r(27, planes, planes)
            bn(src + '.norm2.bn', planes)
            if j == 0:
                sd[src + '.downsample.0.kernel'] = r(cin, planes)
                bn(src + '.downsample.1.bn', planes)
        inpl = planes

    # ---- neck_3d
    n = 'neck_3d.'
    ch = list(neck_channels)
    for i in range(1, len(ch)):
        sd[n + f'up_block_{i}.0.kernel'] = r(8, ch[i], ch[i - 1])
        bn(n + f'up_block_{i}.1.bn', ch[i - 1])
        sd[n + f'up_block_{i}.3.kernel'] = r(27, ch[i - 1], ch[i - 1])
        bn(n + f'up_block_{i}.4.bn', ch[i - 1])
    for i in range(len(ch)):
        sd[n + f'out_block_{i}.0.kernel'] = r(27, ch[i], neck_out)
        bn(n + f'out_block_{i}.1.bn', neck_out)
    sd[n + 'conv_cls.kernel'] = r(neck_out, 1)
    sd[n + 'conv_cls.bias'] = r(1)

    # ---- decoder
    d = 'decoder.'
    De = dec_embed
    for pe, cin in (('self_posembed', 9), ('cross_posembed', 3)):
        sd[d + pe + '.position_embedding_head.0.weight'] = r(De, cin, 1)
        sd[d + pe + '.position_embedding_head.0.bias'] = r(De)
        bn(d + pe + '.position_embedding_head.1', De)
        sd[d + pe + '.position_embedding_head.3.weight'] = r(De, De, 1)
        sd[d + pe + '.position_embedding_head.3.bias'] = r(De)
    ln(d + 'norm', De)
    for i in range(decoder_layers):
        src = d + f'layers.{i}'
        for attn in ('self_attn', 'cross_attn_text', 'cross_attn'):
            sd[src + f'.{attn}.attn.in_proj_weight'] = r(3 * De, De)
            sd[src + f'.{attn}.attn.in_proj_bias'] = r(3 * De)
            lin(src + f'.{attn}.attn.out_proj', De, De)
        for k in range(4):
            ln(src + f'.norms.{k}', De)
        lin(src + '.ffn.layers.0.0', De, dec_ffn)
        lin(src + '.ffn.layers.1', dec_ffn, De)

    # ---- bbox_head (shared pred layer)
    h = 'bbox_head.'
    # log_scale='auto' in the flagship config -> no log_scale param
    # (reference grounding_head.py:48-59)
    sd[h + 'cls_branches.0.bias'] = np.asarray([-4.6], np.float32)
    lin(h + 'reg_branches.0.0', De, De)
    lin(h + 'reg_branches.0.2', De, De)
    lin(h + 'reg_branches.0.4', De, num_reg)

    # ---- text_feat_map
    lin('text_feat_map', E, De)

    # ---- optional 2D ResNet (mmdet/torchvision layout)
    if with_text_encoder:
        # HF CLIPTextModel layout (convert_hf_clip_text's contract)
        tp = 'text_encoder.text_model.'
        sd[tp + 'embeddings.token_embedding.weight'] = r(
            text_vocab, text_width)
        sd[tp + 'embeddings.position_embedding.weight'] = r(
            text_ctx, text_width)
        for i in range(text_layers):
            src = f'{tp}encoder.layers.{i}.'
            for ln_name in ('layer_norm1', 'layer_norm2'):
                sd[src + ln_name + '.weight'] = r(text_width)
                sd[src + ln_name + '.bias'] = r(text_width)
            for proj in ('q_proj', 'k_proj', 'v_proj', 'out_proj'):
                lin(src + 'self_attn.' + proj, text_width, text_width)
            lin(src + 'mlp.fc1', text_width, 4 * text_width)
            lin(src + 'mlp.fc2', 4 * text_width, text_width)
        sd[tp + 'final_layer_norm.weight'] = r(text_width)
        sd[tp + 'final_layer_norm.bias'] = r(text_width)

    if with_backbone2d:
        from ..models.resnet import ResNet
        block_cls, arch = ResNet.arch_settings[img_depth]
        n_convs = 3 if img_depth >= 50 else 2
        bb = 'backbone.'
        sd[bb + 'conv1.weight'] = r(img_base, 3, 7, 7)
        bn(bb + 'bn1', img_base)
        inpl = img_base
        exp = 4 if img_depth >= 50 else 1
        for i, n_blocks in enumerate(arch):
            planes = img_base * 2 ** i
            for j in range(n_blocks):
                src = bb + f'layer{i + 1}.{j}'
                cin = inpl if j == 0 else planes * exp
                widths = ([planes, planes, planes * exp] if n_convs == 3
                          else [planes, planes])
                for ci, w_out in enumerate(widths, start=1):
                    ks = 3 if (n_convs == 2 or ci == 2) else 1
                    sd[src + f'.conv{ci}.weight'] = r(w_out, cin, ks, ks)
                    bn(src + f'.bn{ci}', w_out)
                    cin = w_out
                if j == 0 and (i > 0 or inpl != planes * exp):
                    sd[src + '.downsample.0.weight'] = r(
                        planes * exp, inpl, 1, 1)
                    bn(src + '.downsample.1', planes * exp)
            inpl = planes * exp
    return sd
