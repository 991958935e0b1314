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
# device path #2: Jonker-Volgenant shortest augmenting path (any G)
# --------------------------------------------------------------------------
_JINF = 1e15


def _jv_assign_single(cost: jnp.ndarray, num_g: jnp.ndarray) -> jnp.ndarray:
    """Exact min-cost assignment via successive shortest augmenting paths.

    Complements the subset-DP (capped at 14 gts by its 2^G state space):
    O(G^2 Q) with the per-column scans vectorized, valid for any G <= Q.
    Classic Jonker-Volgenant row addition with dual potentials (the same
    algorithm scipy's linear_sum_assignment uses), expressed with
    lax.while_loop; rows beyond `num_g` get a constant cost, which
    cannot change the optimum over valid rows (a constant row pays the
    same whichever column it takes), and are masked out at the end.

    Args:
        cost: (Q, G) padded cost matrix.
        num_g: scalar int32 count of valid gts.
    Returns:
        (Q,) int32 gt index per query, -1 where unassigned.
    """
    Q, G = cost.shape
    cT = jnp.nan_to_num(cost.T.astype(jnp.float32), nan=100.0,
                        posinf=100.0, neginf=-100.0)  # (G rows, Q cols)
    valid_row = jnp.arange(G) < num_g
    cT = jnp.where(valid_row[:, None], cT, 0.0)

    def do_row(carry, i):
        u, v, p = carry          # duals (G,), (Q,); p[j] = matched row

        def body(st):
            u, v, minv, way, used, j0, _ = st
            sj0 = jnp.maximum(j0, 0)
            used = jnp.where(j0 >= 0, used.at[sj0].set(True), used)
            i0 = jnp.where(j0 >= 0, p[sj0], i)     # row to scan from
            cur = cT[i0] - u[i0] - v               # reduced costs (Q,)
            upd = (~used) & (cur < minv)
            minv = jnp.where(upd, cur, minv)
            way = jnp.where(upd, j0, way)
            d = jnp.where(used, _JINF, minv)
            j1 = jnp.argmin(d).astype(jnp.int32)
            delta = d[j1]
            # dual update: rows on the alternating path = {i} + matched
            # rows of settled columns; their u rises, settled v falls
            row_on_path = jnp.zeros((G, ), bool).at[i].set(True)
            row_on_path = row_on_path.at[jnp.where(used, p, 0)].max(used)
            u = u + jnp.where(row_on_path, delta, 0.0)
            v = v - jnp.where(used, delta, 0.0)
            minv = jnp.where(used, minv, minv - delta)
            done = p[j1] < 0                        # free column reached
            return u, v, minv, way, used, j1, done

        st0 = (u, v, jnp.full((Q, ), _JINF), jnp.full((Q, ), -1, jnp.int32),
               jnp.zeros((Q, ), bool), jnp.int32(-1), False)
        u, v, minv, way, used, j_end, _ = jax.lax.while_loop(
            lambda st: ~st[6], body, st0)

        def aug(st):
            p, j = st
            pj = way[j]          # predecessor column; -1 = direct from i
            prev_row = jnp.where(pj >= 0, p[jnp.maximum(pj, 0)], i)
            return p.at[j].set(prev_row), pj

        p, _ = jax.lax.while_loop(lambda st: st[1] >= 0, aug, (p, j_end))
        return (u, v, p), 0

    init = (jnp.zeros((G, )), jnp.zeros((Q, )),
            jnp.full((Q, ), -1, jnp.int32))
    (_, _, p), _ = jax.lax.scan(do_row, init, jnp.arange(G))
    return jnp.where((p >= 0) & (p < num_g), p, -1).astype(jnp.int32)


@jax.jit
def hungarian_assign_jv(cost: jnp.ndarray,
                        num_gts: jnp.ndarray) -> jnp.ndarray:
    """Batched exact assignment for any gt count: (B, Q, G) -> (B, Q)."""
    return jax.vmap(_jv_assign_single)(cost.astype(jnp.float32),
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
                     method: str = 'auto') -> jnp.ndarray:
    """One-to-one matching of queries to (padded) gts.

    Args:
        cost: (B, Q, Gmax); padded gt columns may hold junk.
        num_gts: (B,) int32 valid gt counts.
        method: 'auto' (subset-DP up to 14 gts, Jonker-Volgenant above —
            both on-device exact), 'dp', 'jv', or 'callback' (scipy on
            host; unusable on the axon TPU backend, kept as the oracle).
    Returns:
        (B, Q) int32 gt index per query, -1 where unassigned.
    """
    if method == 'callback':
        return hungarian_assign_callback(cost, num_gts)
    if method == 'jv':
        return hungarian_assign_jv(cost, num_gts)
    if cost.shape[-1] > 14:
        if method == 'dp':
            raise ValueError(
                f'dp assignment supports <=14 gts, got {cost.shape[-1]}; '
                'use method="jv" or "auto"')
        return hungarian_assign_jv(cost, num_gts)
    return hungarian_assign_dp(cost, num_gts)
