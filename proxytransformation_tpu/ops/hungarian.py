"""Optimal one-to-one assignment (Hungarian matching), TPU-native.

The reference matches DETR queries to gts with scipy on the CPU —
including an intentional 20 ms sleep — forcing a host sync every step
(reference: models/task_modules/assigners/hungarian_assigner.py:119-128).

TPU-first replacement: the number of gts per grounding sample is tiny
(usually 1–10), so the exact optimum is computable **on device** with a
subset-DP over gts: scan the Q queries once, state = bitmask of assigned
gts, dp[s] = min cost. O(Q · 2^G · G) with G ≤ ~12 — microseconds on
the VPU, fully inside jit, no host round-trip, no sleep.

A scipy host-callback path is kept for CPU runs and as a cross-check
oracle (it is bit-identical in cost; tie-breaking may differ).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_INF = 1e9


# --------------------------------------------------------------------------
# device path: exact subset-DP
# --------------------------------------------------------------------------
def _dp_assign_single(cost: jnp.ndarray, num_g: jnp.ndarray) -> jnp.ndarray:
    """Exact min-cost assignment for one sample.

    Args:
        cost: (Q, G) padded cost matrix (padded gt columns ignored).
        num_g: scalar int32 count of valid gts.
    Returns:
        (Q,) int32 gt index per query, -1 where unassigned.
    """
    Q, G = cost.shape
    S = 1 << G
    states = jnp.arange(S, dtype=jnp.int32)
    cost = jnp.nan_to_num(cost, nan=100.0, posinf=100.0, neginf=-100.0)

    def step(dp, q_cost):
        # candidates: assign gt g at this query, arriving from state s\g
        cands = []
        for g in range(G):  # static unroll; G is small
            bit = jnp.int32(1 << g)
            has = (states & bit) > 0
            prev = dp[states ^ bit]
            cands.append(jnp.where(has, prev + q_cost[g], _INF))
        cands = jnp.stack(cands, axis=1)  # (S, G)
        best_g = jnp.argmin(cands, axis=1).astype(jnp.int32)
        best = jnp.take_along_axis(cands, best_g[:, None], axis=1)[:, 0]
        take = best < dp
        new_dp = jnp.where(take, best, dp)
        choice = jnp.where(take, best_g + 1, 0).astype(jnp.int32)
        return new_dp, choice

    dp0 = jnp.full((S, ), _INF, jnp.float32).at[0].set(0.0)
    _, choices = jax.lax.scan(step, dp0, cost)  # choices: (Q, S)

    s_target = (jnp.int32(1) << num_g.astype(jnp.int32)) - 1

    def back(s, q_choice):
        g = q_choice[s]
        assigned = g > 0
        out = jnp.where(assigned, g - 1, -1)
        s = jnp.where(assigned, s ^ (jnp.int32(1) << (g - 1)), s)
        return s, out

    _, rev = jax.lax.scan(back, s_target, choices, reverse=True)
    return rev.astype(jnp.int32)


@jax.jit
def hungarian_assign_dp(cost: jnp.ndarray,
                        num_gts: jnp.ndarray) -> jnp.ndarray:
    """Batched exact on-device assignment: (B, Q, G) → (B, Q)."""
    return jax.vmap(_dp_assign_single)(cost.astype(jnp.float32),
                                       num_gts.astype(jnp.int32))


# --------------------------------------------------------------------------
# host path: scipy (CPU oracle / non-TPU backends)
# --------------------------------------------------------------------------
def _lsa_host(cost: np.ndarray, num_gts: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment
    B, Q, _ = cost.shape
    out = np.full((B, Q), -1, np.int32)
    for i in range(B):
        g = int(num_gts[i])
        if g == 0:
            continue
        c = np.nan_to_num(cost[i, :, :g], nan=100.0, posinf=100.0,
                          neginf=-100.0)
        rows, cols = linear_sum_assignment(c)
        out[i, rows] = cols
    return out


@jax.jit
def hungarian_assign_callback(cost: jnp.ndarray,
                              num_gts: jnp.ndarray) -> jnp.ndarray:
    B, Q, _ = cost.shape
    result_shape = jax.ShapeDtypeStruct((B, Q), jnp.int32)
    return jax.pure_callback(_lsa_host, result_shape,
                             cost.astype(jnp.float32),
                             num_gts.astype(jnp.int32),
                             vmap_method='sequential')


def hungarian_assign(cost: jnp.ndarray,
                     num_gts: jnp.ndarray,
                     method: str = 'dp') -> jnp.ndarray:
    """One-to-one matching of queries to (padded) gts.

    Args:
        cost: (B, Q, Gmax); padded gt columns may hold junk.
        num_gts: (B,) int32 valid gt counts.
        method: 'dp' (on-device exact, default) or 'callback' (scipy).
    Returns:
        (B, Q) int32 gt index per query, -1 where unassigned.
    """
    if method == 'callback':
        return hungarian_assign_callback(cost, num_gts)
    if cost.shape[-1] > 14:
        raise ValueError(
            f'dp assignment supports <=14 gts, got {cost.shape[-1]}; '
            'raise the limit or use method="callback"')
    return hungarian_assign_dp(cost, num_gts)
