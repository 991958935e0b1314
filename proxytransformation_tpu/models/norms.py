"""Masked normalization layers for padded sparse voxel arrays.

Replaces MinkowskiBatchNorm / MinkowskiInstanceNorm (reference:
mink_resnet.py:64-67, mink_neck.py:76,95): statistics are computed over
*valid* voxels only. Like the reference's (non-synced) DDP BatchNorm,
stats are per-device local under data parallelism.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all valid rows of a (B, V, C) array."""
    momentum: float = 0.9  # fraction of old running stat kept
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        C = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((C, )))
        ra_var = self.variable('batch_stats', 'var', lambda: jnp.ones((C, )))
        scale = self.param('scale', nn.initializers.ones, (C, ))
        bias = self.param('bias', nn.initializers.zeros, (C, ))

        xf = x.astype(jnp.float32)  # stats always in f32 (bf16 sums
        if train:                    # over 100k rows lose ~all mantissa)
            m = mask[..., None].astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(xf * m, axis=(0, 1)) / cnt
            var = jnp.sum(jnp.square(xf - mean) * m, axis=(0, 1)) / cnt
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (xf - mean) / jnp.sqrt(var + self.eps) * scale + bias
        return jnp.where(mask[..., None], y, 0.0).astype(x.dtype)


class MaskedInstanceNorm(nn.Module):
    """InstanceNorm: per-sample stats over that sample's valid voxels."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        C = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (C, ))
        bias = self.param('bias', nn.initializers.zeros, (C, ))
        xf = x.astype(jnp.float32)  # f32 stats (see MaskedBatchNorm)
        m = mask[..., None].astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(xf * m, axis=1, keepdims=True) / cnt
        var = jnp.sum(jnp.square(xf - mean) * m, axis=1, keepdims=True) / cnt
        y = (xf - mean) / jnp.sqrt(var + self.eps) * scale + bias
        return jnp.where(mask[..., None], y, 0.0).astype(x.dtype)
