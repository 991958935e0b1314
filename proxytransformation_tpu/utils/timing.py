"""Honest TPU timing.

On this environment's axon backend, `jax.block_until_ready` returns
before remote execution completes and the tunnel round-trip is ~27 ms,
so naive dispatch loops report fantasy numbers (measured: "33 PFLOPs").
The reliable method: run the op N times *inside one jit* with a data
dependency between iterations, force a scalar readback, and difference
two chain lengths to cancel the constant overhead.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def chained_ms_per_iter(step_fn: Callable, init_state, n_short: int = 2,
                        n_long: int = 6, donate: bool = False) -> float:
    """Time `state = step_fn(i, state)` per iteration, in milliseconds.

    step_fn must return a pytree of the same structure as init_state and
    must actually consume its input (data dependency), otherwise the
    compiler may collapse the chain.

    donate=True donates the chain state and re-runs each chain from the
    PREVIOUS output instead of init_state — the only way to time a step
    whose state fills most of HBM (holding init_state for reruns
    double-buffers it: the B=6 train step fits compiled at 15.7 GB but
    OOMs at runtime without donation). The state drifts by a few extra
    optimizer steps between timings, which changes no shapes.
    """

    def make(n):
        def chain(state):
            return jax.lax.fori_loop(0, n, step_fn, state)
        return jax.jit(chain, donate_argnums=(0, ) if donate else ())

    short, long_ = make(n_short), make(n_long)
    state = init_state

    def run(f, state):
        out = f(state)  # warmup/compile
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = float('inf')
        for _rep in range(2):  # min-of-2: tunnel jitter otherwise
            t0 = time.perf_counter()  # swamps short chains (reads of 0.0)
            out = f(out if donate else init_state)
            _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
            best = min(best, (time.perf_counter() - t0) * 1e3)
        return best, out

    t_short, state = run(short, state)
    t_long, _ = run(long_, state)
    return max((t_long - t_short) / (n_long - n_short), 1e-6)
