"""Pallas merge-join lookup vs the XLA sort-join (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from proxytransformation_tpu.ops.merge_join_pallas import (lookup_pmz_stream,
                                                           lookup_stream)
from proxytransformation_tpu.ops.sparse import (_batched_lookup,
                                                _batched_lookup_pmz,
                                                SENTINEL)


def _sorted_keys(rng, B, V, hi, n_valid=None):
    keys = np.full((B, V), int(SENTINEL), np.int32)
    for b in range(B):
        n = n_valid if n_valid is not None else V
        vals = rng.choice(hi, n, replace=False)
        keys[b, :n] = np.sort(vals)
    return keys


def test_pmz_matches_xla_sort_join():
    rng = np.random.RandomState(0)
    B, V, Q = 2, 700, 1500
    keys = _sorted_keys(rng, B, V, 5000, n_valid=600)
    queries = rng.randint(0, 5000, (B, Q)).astype(np.int32)
    queries[0, 5] = int(SENTINEL)     # skipped query
    queries[1, -7:] = int(SENTINEL)   # sentinel tail
    # force dense triples: q-1/q/q+1 all present for some queries
    queries[0, :64] = keys[0, 100:164] + 1

    want = _batched_lookup_pmz(jnp.asarray(keys), jnp.asarray(queries))
    got = lookup_pmz_stream(jnp.asarray(keys), jnp.asarray(queries),
                            tile=256, interpret=True)
    for name, w, g in zip(('minus', 'center', 'plus'), want, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w), err_msg=name)


def test_pmz_consecutive_key_runs():
    """Runs of consecutive keys exercise every decode branch (1-3
    matches per query, middle-index arithmetic)."""
    rng = np.random.RandomState(1)
    B, V = 1, 256
    base = np.sort(rng.choice(800, 200, replace=False)).astype(np.int32)
    keys = np.full((B, V), int(SENTINEL), np.int32)
    keys[0, :200] = base
    queries = np.arange(-2, 810, dtype=np.int32)[None]  # every value
    want = _batched_lookup_pmz(jnp.asarray(keys), jnp.asarray(queries))
    got = lookup_pmz_stream(jnp.asarray(keys), jnp.asarray(queries),
                            tile=128, interpret=True)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_pmz_multi_chunk_windows():
    """Keys spanning several 1024-key chunks; queries hitting chunk
    boundaries."""
    rng = np.random.RandomState(2)
    B, V = 2, 4000
    keys = _sorted_keys(rng, B, V, 60000)
    queries = np.concatenate([
        keys[:, ::3] + 1, keys[:, 1::5] - 1,
        rng.randint(0, 60000, (B, 500)).astype(np.int32)], axis=1)
    want = _batched_lookup_pmz(jnp.asarray(keys), jnp.asarray(queries))
    got = lookup_pmz_stream(jnp.asarray(keys), jnp.asarray(queries),
                            tile=512, interpret=True)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_center_lookup_matches():
    rng = np.random.RandomState(3)
    B, V, Q = 2, 300, 640
    keys = _sorted_keys(rng, B, V, 3000, n_valid=250)
    queries = rng.randint(0, 3000, (B, Q)).astype(np.int32)
    want = _batched_lookup(jnp.asarray(keys), jnp.asarray(queries))
    got = lookup_stream(jnp.asarray(keys), jnp.asarray(queries),
                        tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_all_invalid_tile():
    keys = np.full((1, 128), int(SENTINEL), np.int32)
    keys[0, :4] = [3, 7, 9, 20]
    queries = np.full((1, 256), int(SENTINEL), np.int32)
    got = lookup_pmz_stream(jnp.asarray(keys), jnp.asarray(queries),
                            tile=128, interpret=True)
    for g in got:
        assert (np.asarray(g) == -1).all()


def test_negative_queries():
    keys = np.full((1, 128), int(SENTINEL), np.int32)
    keys[0, :3] = [0, 1, 5]
    queries = np.asarray([[-5, -1, 0, 1, 2, 4, 5, 6]], np.int32)
    want = _batched_lookup_pmz(jnp.asarray(keys), jnp.asarray(queries))
    got = lookup_pmz_stream(jnp.asarray(keys), jnp.asarray(queries),
                            tile=128, interpret=True)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
