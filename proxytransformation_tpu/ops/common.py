"""Masked array helpers shared across ops and models.

Replaces the reference's ragged list-of-tensor idioms and
`masked_gather` (reference: models/necks/preshape_norm_reverse_drop.py:
627-672) with static-shape masked equivalents.
"""
from __future__ import annotations

import jax.numpy as jnp


def masked_gather(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of `points` at `idx`, where idx == -1 yields zeros.

    Args:
        points: (B, P, D).
        idx: (B, K) or (B, M, K) int32 with -1 padding.
    Returns:
        (B, K, D) or (B, M, K, D) gathered points; padded rows are 0.
    """
    mask = idx >= 0
    safe = jnp.where(mask, idx, 0)
    out = jnp.take_along_axis(
        points.reshape(points.shape[0], 1, points.shape[1], points.shape[2])
        if idx.ndim == 3 else points,
        safe[..., None].astype(jnp.int32),
        axis=-2)
    return jnp.where(mask[..., None], out, 0.0)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis, keepdims=False,
                eps: float = 1e-6) -> jnp.ndarray:
    """Mean of `x` over `axis` counting only mask==True positions."""
    mask = mask.astype(x.dtype)
    num = jnp.sum(x * mask, axis=axis, keepdims=keepdims)
    den = jnp.sum(mask, axis=axis, keepdims=keepdims)
    return num / jnp.maximum(den, eps)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis,
               initial: float = -1e30) -> jnp.ndarray:
    """Max of `x` over `axis` where mask==True (masked-out → `initial`)."""
    return jnp.max(jnp.where(mask, x, initial), axis=axis)


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray,
                   axis: int = -1) -> jnp.ndarray:
    """Softmax with masked positions receiving ~0 probability."""
    logits = jnp.where(mask, logits, -1e9)
    e = jnp.exp(logits - jnp.max(logits, axis=axis, keepdims=True))
    return e / jnp.sum(e, axis=axis, keepdims=True)
