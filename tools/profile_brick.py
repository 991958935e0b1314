"""Backbone time vs brick_stages setting, at reference shapes on TPU.

Decides which stages the 2x2x2 brick format actually wins on the real
chip (tools/brick_analysis.py timed one isolated s1 conv; this times
the INTEGRATED backbone: pack/unpack, inverse-map scatter, brick maps,
and per-stage channel widths included).

Run:  python tools/profile_brick.py [--scene surface] [--batch 2]
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scene', choices=('surface', 'uniform'),
                    default='surface')
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--settings', default='();(0,);(0,1)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from proxytransformation_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from proxytransformation_tpu.models.sparse_resnet import MinkResNet
    from proxytransformation_tpu.ops.sparse import voxelize_points
    from proxytransformation_tpu.utils.timing import chained_ms_per_iter
    from bench import _scene_points

    B, N = args.batch, 100_000
    pts = jnp.asarray(_scene_points(B, N, args.scene))
    mask = jnp.ones((B, N), bool)
    lvl0 = jax.jit(lambda p, m: voxelize_points(
        p, m, p, voxel_size=0.01, capacity=100_000))(pts, mask)

    report = {'scene': args.scene, 'batch': B}
    variables = None
    for setting in args.settings.split(';'):
        stages = tuple(int(s) for s in setting.strip('()').split(',')
                       if s.strip())
        model = MinkResNet(depth=34, in_channels=3, brick_stages=stages)
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), lvl0,
                                   train=False)

        def step(i, st, model=model):
            f, = st
            l0 = lvl0._replace(feats=f)
            outs = model.apply(variables, l0, train=False)
            # data-dependent chain: fold each stage's mean back in
            delta = sum(jnp.mean(o.feats) for o in outs)
            return (f + 0.0001 * delta, )

        ms = chained_ms_per_iter(step, (lvl0.feats, ))
        report[str(stages)] = round(ms, 2)
        print(json.dumps({str(stages): round(ms, 2)}), flush=True)

    with open('BRICK_PROFILE.json', 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps({'written': 'BRICK_PROFILE.json'}))


if __name__ == '__main__':
    main()
