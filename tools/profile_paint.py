"""Per-piece timing of 2D→3D painting and the sparse FPN neck.

paint+neck is the second-largest block of the full forward (~104 ms of
342 at B=2, round-3 profile) and was never decomposed. Pieces at real
level shapes: projection math, per-level feature gathers (the
suspected cost — XLA row gathers measured ~33 GB/s on v5e), view-mean,
neck up/out blocks, pruning top-k.

Run from /root/repo:  python tools/profile_paint.py [--batch 2]
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=2)
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp
    from proxytransformation_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from proxytransformation_tpu.utils.timing import chained_ms_per_iter
    from proxytransformation_tpu.models.point_fusion import batch_point_sample
    from proxytransformation_tpu.ops.sparse import (voxelize_points,
                                                    build_neighbor_map)

    rng = np.random.RandomState(0)
    V_views, H, W = 20, 480, 480
    proj = np.tile(
        np.array([[400, 0, W / 2, 0], [0, 400, H / 2, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float32), (B, V_views, 1, 1))
    proj = jnp.asarray(proj)
    views_mask = jnp.ones((B, V_views), bool)

    # levels at the real capacities/channels (sparse stages 1-4 + img)
    level_caps = (50_000, 20_000, 6_000, 2_000)
    img_chans = (64, 128, 256, 512)
    feat_hw = (120, 60, 30, 15)

    pts = jnp.asarray(rng.uniform(0, 6.0, (B, 100_000, 3)), jnp.float32)
    mask = jnp.ones((B, 100_000), bool)

    results = {}

    def record(name, ms):
        results[name] = round(ms, 2)
        print(json.dumps({'component': name, 'ms': results[name]}),
              flush=True)

    for li, (cap, C, hw) in enumerate(zip(level_caps, img_chans, feat_hw)):
        lvl = voxelize_points(pts, mask, pts,
                              voxel_size=0.01 * 2 ** (li + 3),
                              capacity=cap, extent=(160, 160, 64))
        xyz = lvl.world_xyz()
        imf = jnp.asarray(rng.randn(B, V_views, hw, hw, C), jnp.float32)

        paint = jax.vmap(
            lambda f, p, pj, vm, vmask: batch_point_sample(
                f, p, pj, (H, W), valid_mask=vm, views_mask=vmask,
                aligned=False))

        def step(i, state, paint=paint, imf=imf, xyz=xyz, lvl=lvl):
            x, f = state
            out = paint(f, x, proj, lvl.mask, views_mask)
            return (x + 1e-6 * jnp.mean(out), f)

        ms = chained_ms_per_iter(step, (xyz, imf))
        record(f'paint_l{li}_{cap}v_{C}c', ms)

    # neck at real shapes
    from proxytransformation_tpu.models.sparse_neck import MinkNeck
    levels = []
    self_maps = []
    for li, (cap, C, hw) in enumerate(zip(level_caps, img_chans, feat_hw)):
        lvl = voxelize_points(pts, mask, pts,
                              voxel_size=0.01 * 2 ** (li + 3),
                              capacity=cap, extent=(160, 160, 64))
        # painted channels: mink + img
        Cin = (64, 128, 256, 512)[li] + C
        lvl = lvl._replace(feats=jnp.asarray(
            rng.randn(B, cap, Cin), jnp.float32))
        levels.append(lvl)
        self_maps.append(build_neighbor_map(lvl, lvl, 3, 1))

    neck = MinkNeck(num_classes=1,
                    in_channels=tuple(m + i for m, i in
                                      zip((64, 128, 256, 512), img_chans)),
                    out_channels=256, voxel_size=0.01,
                    pts_prune_threshold=1000)
    variables = jax.jit(
        lambda k: neck.init(k, levels, train=False,
                            self_maps=self_maps))(jax.random.PRNGKey(0))

    def neck_step(i, state):
        lvls, v = state
        f, sc, xyz, m = neck.apply(v, lvls, train=False,
                                   self_maps=self_maps)
        new0 = lvls[0]._replace(
            feats=lvls[0].feats + 1e-6 * jnp.mean(f))
        return ([new0] + lvls[1:], v)

    ms = chained_ms_per_iter(neck_step, (levels, variables), n_short=1,
                             n_long=3)
    record('neck_total', ms)

    print(json.dumps({'batch': B, 'summary': results}), flush=True)


if __name__ == '__main__':
    main()
