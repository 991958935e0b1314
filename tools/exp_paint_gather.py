"""Microbench of 2D->3D painting gather formulations on the real TPU.

The round-3 profile pinned painting l0 at 23.8 ms/B=2: an XLA row
gather of (V=20, N=50k) 256-byte feature rows measured ~33 GB/s, ~40x
off HBM speed of light. This experiment races candidate formulations
at the l0 shape to pick the round-3 painting kernel:

  a. current: take_along_axis (V, HW, C) + f32 view-mean
  b. bf16 table copy, same gather
  c. flat global gather over (V*HW, C)
  d. Pallas: featmap resident in VMEM, per-tile one-hot gather over a
     sorted-window (monotone rows) -- only if a vector gather or
     narrow one-hot is expressible
  e. Pallas dynamic-gather op if this Mosaic exposes one

OUTCOME (r3): superseded before it decided anything — the physical
neck compaction moved painting onto the ≤4·P pruned survivor sets, so
the l0 gather operand shrank ~12× and the XLA row gather stopped being
load-bearing. Kept for the shapes/method if painting ever runs at full
capacity again. The sibling probe tools/exp_pallas_gather.py showed
Mosaic cannot lower a vectorized VMEM gather at all.

Run from /root/repo:  python tools/exp_paint_gather.py
"""
import sys

import numpy as np

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp

from proxytransformation_tpu.utils.timing import chained_ms_per_iter

B, V, HW, C, N = 2, 20, 120 * 120, 64, 50_000

rng = np.random.RandomState(0)
feat = jnp.asarray(rng.randn(B, V, HW, C), jnp.float32)
idx = jnp.asarray(rng.randint(0, HW, (B, V, N)), jnp.int32)
valid = jnp.asarray(rng.rand(B, V, N) < 0.3)


def mean_views(g, valid):
    g = jnp.where(valid[..., None], g, 0.0)
    cnt = jnp.sum(valid, axis=1)
    out = jnp.sum(g.astype(jnp.float32), axis=1) / jnp.clip(
        cnt[..., None], 1, None)
    return out


def variant_a(feat, idx, valid):
    g = jnp.take_along_axis(feat, idx[..., None], axis=2)
    return mean_views(g, valid)


def variant_b(feat, idx, valid):
    g = jnp.take_along_axis(feat.astype(jnp.bfloat16), idx[..., None],
                            axis=2)
    return mean_views(g, valid)


def variant_c(feat, idx, valid):
    flat = feat.reshape(B * V * HW, C)
    gidx = (jnp.arange(B * V, dtype=jnp.int32).reshape(B, V, 1) * HW
            + idx).reshape(-1)
    g = jnp.take(flat, gidx, axis=0).reshape(B, V, N, C)
    return mean_views(g, valid)


def variant_c16(feat, idx, valid):
    flat = feat.astype(jnp.bfloat16).reshape(B * V * HW, C)
    gidx = (jnp.arange(B * V, dtype=jnp.int32).reshape(B, V, 1) * HW
            + idx).reshape(-1)
    g = jnp.take(flat, gidx, axis=0).reshape(B, V, N, C)
    return mean_views(g, valid)


def run(name, fn):
    def step(i, state):
        x, s = state
        out = fn(feat, jnp.clip(idx + i, 0, HW - 1), valid)
        return (x, s + jnp.sum(out[:, 0]))

    try:
        ms = chained_ms_per_iter(step, (jnp.zeros(()), jnp.zeros(())))
        gb = B * V * N * C * 4 / 1e9
        print(f'{name:12s} {ms:8.2f} ms   gathered-f32-GB/s '
              f'{gb / ms * 1e3:7.1f}', flush=True)
    except Exception as e:  # noqa: BLE001
        print(f'{name:12s} FAILED: {type(e).__name__}: {e}', flush=True)


run('take_along', variant_a)
run('take_bf16', variant_b)
run('flat_take', variant_c)
run('flat_bf16', variant_c16)
