"""Pallas TPU kernel for ball query (first-K-within-radius).

The hot op of the ProxyTransformation preshape (two calls per forward,
1728 centers × 100k points, reference preshape_norm_reverse_drop.py:
56,65). The XLA formulation (ops/ball_query.py) spends its time in
per-chunk top-k sorts or one-hot reduces; this kernel fuses everything
in VMEM:

  grid = (B, M/TM, N/T); the last (point-chunk) axis is sequential so
  per-center accumulators live in scratch across chunks:
    * (T, TM) squared-distance tile via VPU subtract-square broadcasts
      (a 3-deep MXU matmul pads its contraction to 128 — ~40× wasted
      FLOPs — and was the dominant per-chunk cost);
    * first-K selection via running count + in-chunk sublane prefix sum
      and a predicated reduce over a DYNAMIC slot window: only the
      [min(count), max(min(count+hits, K))) slots that can fill this
      chunk are visited, so a chunk that adds nothing costs ~the
      distance tile alone (positions are unique per center, so slot k
      takes Σ_t [pos==k]·(t+1));
    * runtime chunk skip: once every center in the tile has K
      neighbors, the remaining chunks are branched over entirely —
      with the reference's large radius most tiles saturate within the
      first few chunks. Row padding repeats a REAL center so the padded
      tail tile saturates with the data instead of scanning everything.

Returns indices only (the caller gathers); -1 padded, bit-exact with
the XLA/pytorch3d first-K-in-point-order semantics (the XLA oracle
computes the identical subtract-square distances).
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
        c3 = centers_ref[0]  # (3, TM), coordinate-major
        p4 = points_ref[0]  # (T, 4): xyz + validity
        dx = p4[:, 0:1] - c3[0:1]  # (T, TM)
        dy = p4[:, 1:2] - c3[1:2]
        dz = p4[:, 2:3] - c3[2:3]
        d2 = dx * dx + dy * dy + dz * dz
        within = (d2 < r2_ref[0]) & (p4[:, 3:4] > 0)
        wi = within.astype(jnp.int32)
        # prefix sum along sublanes (cumsum is not lowered on TPU):
        # log2(T) doubling steps of zero-filled shifts
        cum = wi
        s = 1
        while s < T:
            shifted = jnp.concatenate(
                [jnp.zeros((s, TM), jnp.int32), cum[:T - s]], axis=0)
            cum = cum + shifted
            s *= 2
        count = count_ref[0:1]  # (1, TM) int32
        pos = count + cum - 1  # (T, TM)
        hits = cum[T - 1:T]  # (1, TM)
        tval = (nt * T + jax.lax.broadcasted_iota(jnp.int32, (T, TM), 0)
                + 1)
        sel = jnp.where(within & (pos < K), tval, 0)
        # dynamic slot window: slots below every gaining center's start
        # or at/after the saturation point cannot receive a value
        kmin = jnp.min(jnp.where(hits > 0, jnp.minimum(count, K), K))
        kmax = jnp.max(jnp.minimum(count + hits, K))

        def kbody(k, _):
            # slot k gets the unique t with pos == k (predicated reduce)
            row = jnp.sum(jnp.where(pos == k, sel, 0), axis=0,
                          keepdims=True)  # (1, TM)
            acc_ref[pl.dslice(k, 1), :] = acc_ref[pl.dslice(k, 1), :] + row
            return 0

        jax.lax.fori_loop(kmin, kmax, kbody, 0)
        count_ref[:] = count + hits

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
        # repeat a real center: the padded rows then saturate with the
        # data (a far-away sentinel would never reach K hits and force
        # the tail tile to scan every chunk)
        centers = jnp.concatenate(
            [centers,
             jnp.broadcast_to(centers[:, :1], (B, m_pad, 3))], axis=1)
    if n_pad:
        points = jnp.pad(points, ((0, 0), (0, n_pad), (0, 0)))
        points_mask = jnp.pad(points_mask, ((0, 0), (0, n_pad)))
    Mp, Np = M + m_pad, N + n_pad
    # fold validity into a 4th point channel (clean (T, 4) blocks);
    # centers go coordinate-major so the kernel broadcasts (T,1)-(1,TM)
    p4 = jnp.concatenate(
        [points, points_mask.astype(jnp.float32)[..., None]], -1)
    c3 = centers.transpose(0, 2, 1)  # (B, 3, Mp)
    r2 = jnp.reshape(radius2.astype(jnp.float32), (1, ))

    grid = (B, Mp // TM, Np // T)
    out = pl.pallas_call(
        functools.partial(_kernel, K=KP, TM=TM, T=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, TM), lambda b, mt, nt: (b, 0, mt)),
            pl.BlockSpec((1, T, 4), lambda b, mt, nt: (b, nt, 0)),
        ],
        out_specs=pl.BlockSpec((1, KP, TM), lambda b, mt, nt: (b, 0, mt)),
        out_shape=jax.ShapeDtypeStruct((B, KP, Mp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((KP, TM), jnp.int32),
            pltpu.VMEM((1, TM), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=interpret,
    )(r2, c3, p4)
    return out.transpose(0, 2, 1)[:, :M, :K]


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
