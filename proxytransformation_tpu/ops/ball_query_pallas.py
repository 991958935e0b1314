"""Pallas TPU kernel for ball query (first-K-within-radius).

The hot op of the ProxyTransformation preshape (two calls per forward,
1728 centers × 100k points, reference preshape_norm_reverse_drop.py:
56,65). The XLA formulation (ops/ball_query.py) spends its time in
per-chunk top-k sorts or one-hot reduces; this kernel fuses everything
in VMEM:

  grid = (B, M/TM, N/T); the last (point-chunk) axis is sequential so
  per-center accumulators live in scratch across chunks:
    * (TM, T) squared-distance tile via an MXU matmul;
    * first-K selection via running count + in-chunk cumsum and a
      K-step predicated reduce (positions are unique per row, so slot k
      takes Σ_t [pos==k]·(t+1));
    * runtime chunk skip: once every center in the tile has K
      neighbors, the remaining chunks are branched over entirely —
      with the reference's large radius most tiles saturate within the
      first few chunks.

Returns indices only (the caller gathers); -1 padded, bit-exact with
the XLA/pytorch3d first-K-in-point-order semantics.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(r2_ref, centers_ref, points_ref, out_ref,
            acc_ref, count_ref, *, K: int, TM: int, T: int):
    nt = pl.program_id(2)
    n_chunks = pl.num_programs(2)

    @pl.when(nt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        count_ref[:] = jnp.zeros_like(count_ref)

    # skip the whole chunk once every center in the tile is full
    @pl.when(jnp.min(count_ref[:]) < K)
    def _():
        c = centers_ref[0]  # (TM, 3)
        p4 = points_ref[0]  # (T, 4): xyz + validity
        p = p4[:, :3]
        d2 = (jnp.sum(c * c, -1, keepdims=True)
              - 2.0 * jax.lax.dot_general(
                  c, p, (((1, ), (1, )), ((), ())),
                  precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
              + jnp.sum(p * p, -1)[None, :])  # (TM, T)
        within = (d2 < r2_ref[0]) & (p4[:, 3] > 0)[None, :]
        wi = within.astype(jnp.int32)
        # manual prefix sum along lanes (cumsum is not lowered on TPU):
        # log2(T) doubling steps of zero-filled shifts
        cum = wi
        s = 1
        while s < T:
            shifted = jnp.concatenate(
                [jnp.zeros((TM, s), jnp.int32), cum[:, :T - s]], axis=1)
            cum = cum + shifted
            s *= 2
        count = count_ref[:, 0:1]  # (TM, 1) int32
        pos = count + cum - 1
        tval = (nt * T + jax.lax.broadcasted_iota(jnp.int32, (TM, T), 1)
                + 1)
        sel = jnp.where(within & (pos < K), tval, 0)
        # slot k gets the unique t with pos == k (predicated reduce)
        for k in range(K):
            acc_ref[:, k] += jnp.sum(jnp.where(pos == k, sel, 0), axis=1)
        count_ref[:, 0] += jnp.sum(wi, axis=1)

    @pl.when(nt == n_chunks - 1)
    def _():
        out_ref[0] = acc_ref[:] - 1  # empty slots: 0-1 = -1


@functools.partial(jax.jit,
                   static_argnames=('K', 'TM', 'T', 'interpret'))
def ball_query_idx_pallas(centers: jnp.ndarray, points: jnp.ndarray,
                          points_mask: jnp.ndarray, radius2: jnp.ndarray,
                          K: int, TM: int = 128, T: int = 2048,
                          interpret: bool = False) -> jnp.ndarray:
    """(B, M, 3) centers × (B, N, 3) points → (B, M, K) int32 indices."""
    B, M, _ = centers.shape
    N = points.shape[1]
    KP = -(-K // 8) * 8  # padded slot dim for clean tiling
    m_pad = (-M) % TM
    n_pad = (-N) % T
    if m_pad:
        centers = jnp.pad(centers, ((0, 0), (0, m_pad), (0, 0)),
                          constant_values=1e9)
    if n_pad:
        points = jnp.pad(points, ((0, 0), (0, n_pad), (0, 0)))
        points_mask = jnp.pad(points_mask, ((0, 0), (0, n_pad)))
    Mp, Np = M + m_pad, N + n_pad
    # fold validity into a 4th point channel (clean (T, 4) blocks)
    p4 = jnp.concatenate(
        [points, points_mask.astype(jnp.float32)[..., None]], -1)
    r2 = jnp.reshape(radius2.astype(jnp.float32), (1, ))

    grid = (B, Mp // TM, Np // T)
    out = pl.pallas_call(
        functools.partial(_kernel, K=KP, TM=TM, T=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TM, 3), lambda b, mt, nt: (b, mt, 0)),
            pl.BlockSpec((1, T, 4), lambda b, mt, nt: (b, nt, 0)),
        ],
        out_specs=pl.BlockSpec((1, TM, KP), lambda b, mt, nt: (b, mt, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Mp, KP), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((TM, KP), jnp.int32),
            pltpu.VMEM((TM, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(r2, centers, p4)
    return out[:, :M, :K]


def ball_query_pallas(centers: jnp.ndarray, points: jnp.ndarray, K: int,
                      radius: float,
                      points_mask: Optional[jnp.ndarray] = None,
                      interpret: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ops.ball_query.ball_query using the Pallas kernel."""
    from .common import masked_gather
    if points_mask is None:
        points_mask = jnp.ones(points.shape[:2], bool)
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    # indices are int (non-differentiable, like pytorch3d's); gradients
    # flow through the gathered values — stop tangents so autodiff never
    # tries to JVP through the kernel
    idx = ball_query_idx_pallas(
        jax.lax.stop_gradient(centers.astype(jnp.float32)),
        jax.lax.stop_gradient(points.astype(jnp.float32)), points_mask,
        r2, K, interpret=interpret)
    return idx, masked_gather(points, idx)
