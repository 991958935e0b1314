"""Pallas ball-query kernel vs the XLA formulation (interpret mode on
CPU; on TPU the jitted kernel is bit-exact — verified on-device)."""
import numpy as np
import jax.numpy as jnp

from proxytransformation_tpu.ops.ball_query import _ball_query_idx
from proxytransformation_tpu.ops.ball_query_pallas import ball_query_pallas


def test_pallas_kernel_matches_xla_interpret():
    rng = np.random.RandomState(0)
    B, N, M, K = 2, 600, 40, 6
    pts = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)).astype(np.float32))
    mask = jnp.ones((B, N), bool).at[:, N - 50:].set(False)
    centers = jnp.asarray(rng.uniform(-2, 2, (B, M, 3)).astype(np.float32))
    r2 = jnp.asarray(1.0)
    ref = _ball_query_idx(centers, pts, mask, r2, K, 128)
    got, grouped = ball_query_pallas(centers, pts, K=K, radius=1.0,
                                     points_mask=mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # gathered points zero at padding
    g = np.asarray(grouped)
    assert np.all(g[np.asarray(got) < 0] == 0)
