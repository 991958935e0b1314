"""Benchmark: ProxyTransformation preshape forward, scenes/sec/chip.

Measures BASELINE.json config #3 — "full ProxyTransformation module:
text + multi-view image proxies, batch=4 scenes" — at the reference
scale (grid 12 → 1728 clusters, dynamic_drop 0.6, 100k points, 20
views, CLIP-text dims), on whatever backend is available (the real TPU
under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is measured against the provisional round-1 TPU number
recorded in BASELINE.md (the reference repo publishes no numbers and
its CUDA/MinkowskiEngine stack cannot run here; see BASELINE.md).
"""
import json
import time

import numpy as np

# Anchor for vs_baseline: the honest round-1 TPU measurement (see
# BASELINE.md). The PyTorch reference's CUDA/MinkowskiEngine stack
# cannot run in this environment and the repo publishes no numbers, so
# improvements are tracked against our own first honest measurement
# (pre-Pallas XLA formulation: 4.6 scenes/s; with the Pallas ball-query
# kernel: ~176 scenes/s — the anchor).
BASELINE_SCENES_PER_SEC = 176.0


def main():
    import jax
    from proxytransformation_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from proxytransformation_tpu.models.preshape import (
        ProxyTransformationNormReverse)

    B, N, V, L = 4, 100_000, 20, 32
    model = ProxyTransformationNormReverse(
        embed_dim=256, num_heads=8, n_points=N, grid_size=12,
        text_blocks=3, img_blocks=3, dynamic_drop_radio=0.6, num_sub=30,
        input_dim=512, img_spacial_dim=15)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-5, 5, (B, N, 3)).astype(np.float32))
    mask = jnp.ones((B, N), bool)
    text = jnp.asarray(rng.randn(B, L, 256).astype(np.float32))
    tmask = jnp.ones((B, L), bool)
    img = jnp.asarray(rng.randn(B, V, 15, 15, 512).astype(np.float32))

    variables = model.init(jax.random.PRNGKey(0), pts, mask, text, tmask,
                           img, train=False)

    # Honest timing: chained in-jit iterations with a data dependency +
    # scalar readback; two chain lengths cancel dispatch/RTT overhead
    # (this environment's remote backend makes naive dispatch loops
    # meaningless — see utils/timing.py).
    from proxytransformation_tpu.utils.timing import chained_ms_per_iter

    def step(i, p):
        out, m = model.apply(variables, p, mask, text, tmask, img,
                             train=False)
        return p + 0.0001 * jnp.where(m[..., None], out - p, 0.0)

    ms = chained_ms_per_iter(step, pts)
    scenes_per_sec = B / (ms / 1e3)

    print(json.dumps({
        'metric': 'proxy_transformation_fwd_scenes_per_sec_per_chip',
        'value': round(scenes_per_sec, 2),
        'unit': 'scenes/s',
        'vs_baseline': round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
