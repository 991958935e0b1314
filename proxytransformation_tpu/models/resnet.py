"""2D ResNet backbone (mmdet-style) in flax.

Mirrors the reference's `mmdet.ResNet` depth-50 config with
`base_channels=16` (reference config
configs/grounding/proxy-tiblock33-gs12-wbias-ddr0.6-clip.py:30-40):
stage output channels are [64, 128, 256, 512] (base 16 × expansion 4 ×
2^i), `style='pytorch'` (stride on the 3×3 conv), frozen stem+stage1 and
eval-mode BatchNorm (`norm_eval=True` → running stats always, which is
how we implement it: BN is never in train mode here).

Weights load from a torchvision resnet50 checkpoint via
`convert_torch_resnet` when a file is available; otherwise random init.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import MODELS


class _BN(nn.Module):
    """Eval-mode BatchNorm (running stats only, affine).

    Statistics and affine math stay float32 regardless of the compute
    dtype; the output is cast back to the input's dtype."""

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((C, ))).value
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((C, ))).value
        scale = self.param('scale', nn.initializers.ones, (C, ))
        bias = self.param('bias', nn.initializers.zeros, (C, ))
        eff_scale = scale / jnp.sqrt(var + 1e-5)
        eff_bias = bias - mean * eff_scale
        y = x.astype(jnp.float32) * eff_scale + eff_bias
        return y.astype(x.dtype)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name='conv1')(x)
        out = _BN(name='bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype, name='conv2')(out)
        out = _BN(name='bn2')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False, dtype=self.dtype,
                      name='conv3')(out)
        out = _BN(name='bn3')(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name='downsample_conv')(x)
            identity = _BN(name='downsample_bn')(identity)
        return nn.relu(out + identity)


class BasicBlock2D(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, ) * 2,
                      padding=1, use_bias=False, dtype=self.dtype, name='conv1')(x)
        out = _BN(name='bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                      name='conv2')(out)
        out = _BN(name='bn2')(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, ) * 2, use_bias=False, dtype=self.dtype,
                               name='downsample_conv')(x)
            identity = _BN(name='downsample_bn')(identity)
        return nn.relu(out + identity)


@MODELS.register_module()
class ResNet(nn.Module):
    """mmdet-style ResNet; input NHWC, returns the 4 stage outputs."""
    depth: int = 50
    base_channels: int = 16
    num_stages: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = 1  # handled by the optimizer mask, kept for parity
    remat: bool = False  # rematerialize per-block (jax.checkpoint)
    # compute dtype for convs + activations (params and BN statistics
    # stay float32; bfloat16 halves the activation stash and doubles
    # MXU throughput)
    dtype: jnp.dtype = jnp.float32

    arch_settings = {
        18: (BasicBlock2D, (2, 2, 2, 2)),
        34: (BasicBlock2D, (3, 4, 6, 3)),
        50: (Bottleneck, (3, 4, 6, 3)),
        101: (Bottleneck, (3, 4, 23, 3)),
    }

    @nn.compact
    def __call__(self, x):
        block_cls, stage_blocks = self.arch_settings[self.depth]
        if self.remat:
            block_cls = nn.remat(block_cls)
        stage_blocks = stage_blocks[:self.num_stages]
        x = x.astype(self.dtype)
        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = _BN(name='bn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for i, n_blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2 ** i
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = block_cls(planes, stride, dtype=self.dtype,
              name=f'layer{i + 1}_{j}')(x)
            if i in self.out_indices:
                outs.append(x)
        return outs


def convert_torch_resnet(state_dict, base_channels=16, depth=50):
    """torchvision/mmdet ResNet state_dict → flax params/batch_stats.

    Accepts a dict of numpy arrays (torch tensors converted upstream).
    """
    import numpy as np
    params, stats = {}, {}

    def put(tree, path, val):
        d = tree
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = jnp.asarray(val)

    def conv_w(w):  # torch OIHW → flax HWIO
        return np.transpose(w, (2, 3, 1, 0))

    def bn(dst, src):
        put(params, dst + ('scale', ), state_dict[src + '.weight'])
        put(params, dst + ('bias', ), state_dict[src + '.bias'])
        put(stats, dst + ('mean', ), state_dict[src + '.running_mean'])
        put(stats, dst + ('var', ), state_dict[src + '.running_var'])

    put(params, ('conv1', 'kernel'), conv_w(state_dict['conv1.weight']))
    bn(('bn1', ), 'bn1')
    arch = ResNet.arch_settings[depth][1]
    n_convs = 3 if depth >= 50 else 2
    for i, n_blocks in enumerate(arch):
        for j in range(n_blocks):
            src = f'layer{i + 1}.{j}'
            dst = f'layer{i + 1}_{j}'
            for c in range(1, n_convs + 1):
                put(params, (dst, f'conv{c}', 'kernel'),
                    conv_w(state_dict[f'{src}.conv{c}.weight']))
                bn((dst, f'bn{c}'), f'{src}.bn{c}')
            if f'{src}.downsample.0.weight' in state_dict:
                put(params, (dst, 'downsample_conv', 'kernel'),
                    conv_w(state_dict[f'{src}.downsample.0.weight']))
                bn((dst, 'downsample_bn'), f'{src}.downsample.1')
    return params, stats
