"""Time the REAL eval configuration: B=1, 50 ordered views, 100k pts.

This is the deployment workload — the reference evaluates with 50
ordered views per scene at batch 1 (reference configs/grounding/
proxy-tiblock33-gs12-wbias-ddr0.6-clip.py:126-142,166-179), while every
bench stage so far ran the 20-view train-shaped forward (VERDICT r4
next-step #3: "measure the real eval configuration once — it has never
been timed").

Measures the full predict-path forward (extract_feat over 50 views +
decoder + head) with the same chained-iteration timing the bench uses,
on whatever backend is live (the real TPU under axon). Prints one JSON
line and appends nothing anywhere — paste the number into BASELINE.md.

Usage:  python tools/profile_eval50.py [--views 50] [--batch 1]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--views', type=int, default=50)
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--scene', default='surface',
                    choices=['surface', 'uniform'])
    ap.add_argument('--dtype', default='float32',
                    help='compute dtype (reference evals in f32)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from proxytransformation_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from proxytransformation_tpu.utils.timing import chained_ms_per_iter
    from bench import _flagship_batch
    from proxytransformation_tpu.models.detector import (
        SparseFeatureFusion3DGrounderPreshape)

    # remat_painting bounds the 50-view painting gathers' live memory;
    # the eval batch is 1 so it is cheap insurance, not a perf lever
    model = SparseFeatureFusion3DGrounderPreshape(
        compute_dtype=args.dtype, remat_painting=args.views > 20)
    batch = _flagship_batch(jnp, args.batch, V=args.views,
                            scene=args.scene)
    variables = jax.jit(
        lambda rng, b: model.init(rng, b, mode='predict'))(
            jax.random.PRNGKey(0), batch)

    def step(i, state):
        b, v = state
        out = model.apply(v, b, mode='predict')
        b = dict(b)
        b['points'] = b['points'] + 1e-6 * jnp.mean(out['scores_3d'])
        return (b, v)

    ms = chained_ms_per_iter(step, (batch, variables), n_short=1,
                             n_long=3)
    print(json.dumps({
        'workload': f'eval_fwd B={args.batch} V={args.views} '
                    f'{args.scene} {args.dtype}',
        'ms': round(ms, 1),
        'scenes_per_sec': round(args.batch / (ms / 1e3), 2),
        'backend': jax.devices()[0].platform,
    }))


if __name__ == '__main__':
    main()
