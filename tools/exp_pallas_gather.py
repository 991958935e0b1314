"""Probe Mosaic for an expressible in-VMEM vector gather.

Three candidate lowerings for `out[i] = table[idx[i], :]` with the
table resident in VMEM:

  1. jnp.take_along_axis on a VMEM ref value (does Mosaic lower a
     sublane-dimension dynamic gather at all?)
  2. one-hot matmul over a 128-row window (known-good, MXU)
  3. per-sublane loop of pl.ds dynamic slices (known-good, slow?)

Run from /root/repo:  python tools/exp_pallas_gather.py
"""
import functools
import sys

import numpy as np

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ROWS, C, T = 14336, 64, 256  # table rows, channels, points per tile

rng = np.random.RandomState(0)
table = jnp.asarray(rng.randn(ROWS, C), jnp.float32)
idx = jnp.asarray(rng.randint(0, ROWS, (T,)), jnp.int32)


def kernel_take(table_ref, idx_ref, out_ref):
    t = table_ref[...]
    ix = idx_ref[...]
    out_ref[...] = jnp.take(t, ix, axis=0)


def kernel_take_along(table_ref, idx_ref, out_ref):
    t = table_ref[...]
    ix = idx_ref[...]
    out_ref[...] = jnp.take_along_axis(
        t, ix[:, None] * jnp.ones((1, C), jnp.int32), axis=0)


def try_kernel(name, kern):
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T, C), jnp.float32),
        )(table, idx)
        ref = np.asarray(table)[np.asarray(idx)]
        ok = np.allclose(np.asarray(out), ref)
        print(f'{name}: lowered, correct={ok}', flush=True)
        return ok
    except Exception as e:  # noqa: BLE001
        lines = str(e).splitlines() or [repr(e)]
        print(f'{name}: FAILED {type(e).__name__}: {lines[0][:200]}',
              file=sys.stderr, flush=True)
        print(f'{name}: FAILED {type(e).__name__}', flush=True)
        return False


try_kernel('jnp.take', kernel_take)
try_kernel('take_along_axis', kernel_take_along)
