"""(tile, chunk) scan for the column-window sparse conv kernel.

The tuned table in ops/sparse.py::_colwin_params came from a scan on
uniform-random voxel occupancy; surface scans (the real workload — see
data/synthetic.py) have the same per-column window widths but different
window alignment/miss statistics, so the optimum may shift. This scans
the real backbone stage shapes built from a surface scene and prints
ms per config.

Run from /root/repo:  python tools/tune_conv.py [--batch 2]
"""
import argparse
import itertools
import json
import sys

import numpy as np

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--scene', choices=('surface', 'uniform'),
                    default='surface')
    ap.add_argument('--tiles', type=str, default='128,256')
    ap.add_argument('--chunks', type=str, default='256,512')
    ap.add_argument('--shapes', type=str, default='s1,s2',
                    help='comma list of shape-name prefixes to scan')
    ap.add_argument('--fold', type=str, default='auto',
                    help='auto | both | 0 | 1 — column-fold kernel choice')
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp
    from proxytransformation_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from proxytransformation_tpu.utils.timing import chained_ms_per_iter
    from proxytransformation_tpu.ops.sparse import (voxelize_points,
                                                    downsample_coords,
                                                    build_neighbor_map)
    from proxytransformation_tpu.ops.sparse_conv_pallas import (
        sparse_conv_gather_gemm_colwin)

    rng = np.random.RandomState(0)
    if args.scene == 'uniform':
        pts = jnp.asarray(
            rng.uniform(0, 6.0, (B, 100_000, 3)).astype(np.float32))
    else:
        from proxytransformation_tpu.data.synthetic import (
            surface_scene_batch)
        pts = jnp.asarray(surface_scene_batch(B, 100_000, seed=0))
    mask = jnp.ones((B, 100_000), bool)

    caps = (100_000, 80_000, 50_000, 20_000, 6_000, 2_000)
    lvl0 = jax.jit(lambda p, m: voxelize_points(
        p, m, p, voxel_size=0.01, capacity=caps[0]))(pts, mask)

    @jax.jit
    def chain(l0):
        lv1 = downsample_coords(l0, caps[0])
        lv2 = downsample_coords(lv1, caps[1])
        s1 = downsample_coords(lv2, caps[2])
        s2 = downsample_coords(s1, caps[3])
        s3 = downsample_coords(s2, caps[4])
        s4 = downsample_coords(s3, caps[5])
        return lv1, lv2, s1, s2, s3, s4

    lv1, lv2, s1, s2, s3, s4 = jax.block_until_ready(chain(lvl0))

    tiles = [int(x) for x in args.tiles.split(',')]
    chunks = [int(x) for x in args.chunks.split(',')]
    shapes = [('s1_50k_c64', s1, 64, 64), ('s2_20k_c128', s2, 128, 128),
              ('s3_6k_c256', s3, 256, 256), ('s4_2k_c512', s4, 512, 512),
              ('stem_100k_c3', lv1, 3, 64)]
    want = tuple(args.shapes.split(','))
    shapes = [s for s in shapes if s[0].startswith(want)]

    best = {}
    for name, lvl, cin, cout in shapes:
        if name.startswith('stem'):
            nbr = jax.jit(lambda a, b: build_neighbor_map(
                a, b, kernel_size=3, stride=2))(lvl0, lvl)
        else:
            nbr = jax.jit(lambda a, b: build_neighbor_map(
                a, b, kernel_size=3, stride=1))(lvl, lvl)
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * .05)
        f0 = jnp.asarray(rng.randn(
            B, (lvl0 if name.startswith('stem') else lvl).capacity,
            cin).astype(np.float32))
        folds = {'auto': (None, ), 'both': (False, True),
                 '0': (False, ), '1': (True, )}[args.fold]
        for tile, chunk, fold in itertools.product(tiles, chunks, folds):
            def step(i, st_):
                f, = st_
                out = sparse_conv_gather_gemm_colwin(
                    f, nbr, w, lvl.mask, tile=tile, chunk=chunk,
                    fold=fold)
                if cin == cout:
                    upd = jnp.zeros_like(f).at[:, :out.shape[1]].set(
                        0.001 * out)
                    return (f + upd, )
                return (f + 0.001 * jnp.mean(out), )
            try:
                ms = chained_ms_per_iter(step, (f0, ), n_short=1, n_long=4)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({'shape': name, 'tile': tile,
                                  'chunk': chunk, 'fold': fold,
                                  'error': str(e)[-120:]}), flush=True)
                continue
            print(json.dumps({'shape': name, 'tile': tile, 'chunk': chunk,
                              'fold': fold, 'ms': round(ms, 2)}),
                  flush=True)
            if name not in best or ms < best[name][2]:
                best[name] = (tile, chunk, ms, fold)
    print(json.dumps({'best': {k: {'tile': v[0], 'chunk': v[1],
                                   'ms': round(v[2], 2), 'fold': v[3]}
                               for k, v in best.items()}}), flush=True)


if __name__ == '__main__':
    main()
