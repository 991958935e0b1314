"""Farthest point sampling, TPU-native.

Replaces pytorch3d's CUDA `sample_farthest_points` (used at reference
models/necks/preshape_norm_reverse_drop.py:393) and torch_cluster's
`fps` (reference datasets/transforms/points.py:12-15). Semantics follow
the reference's own pure-torch oracle
(`sample_farthest_points_naive`, preshape_norm_reverse_drop.py:527-625):
start at index 0, then iteratively pick the point with the largest
distance to the already-selected set.

TPU-first: a `lax.fori_loop` over K steps, each a fused
(B, P) distance update + argmax — no host round-trips, static shapes.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .common import masked_gather


@partial(jax.jit, static_argnames=('K', ))
def _fps_idx(points: jnp.ndarray, mask: jnp.ndarray, K: int,
             rng=None) -> jnp.ndarray:
    B, P, _ = points.shape
    if rng is None:
        # Start at the first valid point (index 0 when fully valid,
        # matching the reference oracle with random_start_point=False).
        start = jnp.argmax(mask, axis=1).astype(jnp.int32)  # (B,)
    else:
        # pytorch3d's default random start (sample_farthest_points
        # random_start_point=True): uniform over valid points
        g = jax.random.gumbel(rng, (B, P))
        start = jnp.argmax(jnp.where(mask, g, -jnp.inf),
                           axis=1).astype(jnp.int32)

    out = jnp.full((B, K), -1, jnp.int32).at[:, 0].set(start)
    closest = jnp.where(mask, jnp.inf, -jnp.inf)  # (B, P)

    def body(i, carry):
        out, closest, last = carry
        last_xyz = jnp.take_along_axis(points, last[:, None, None], axis=1)
        d2 = jnp.sum((points - last_xyz) ** 2, axis=-1)  # (B, P)
        d2 = jnp.where(mask, d2, -jnp.inf)
        closest = jnp.minimum(closest, d2)
        nxt = jnp.argmax(closest, axis=1).astype(jnp.int32)
        out = out.at[:, i].set(nxt)
        return out, closest, nxt

    out, _, _ = jax.lax.fori_loop(1, K, body, (out, closest, start))
    return out


def sample_farthest_points(
        points: jnp.ndarray,
        K: int,
        mask: Optional[jnp.ndarray] = None,
        rng: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Farthest point sampling on padded clouds.

    Args:
        points: (B, P, 3).
        K: number of samples (static).
        mask: optional (B, P) validity mask.
        rng: optional PRNG key for a random start point (pytorch3d's
            train-time default); deterministic first-valid start when
            None (the reference oracle's random_start_point=False).

    Returns:
        sampled: (B, K, 3) selected points.
        idx: (B, K) int32 selected indices.
    """
    if mask is None:
        mask = jnp.ones(points.shape[:2], bool)
    idx = _fps_idx(points.astype(jnp.float32), mask, K, rng)
    return masked_gather(points, idx), idx
