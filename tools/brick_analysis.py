"""Brick-format (2x2x2) decision analysis — measure, then land or kill.

The brick format was the top-ranked conv lever for two rounds (8x fewer
map entries / one-hot rows). Whether it WINS depends on one number this
tool measures — the brick occupancy o (occupied cells per occupied
2-cell brick, /8) at each backbone level on REAL surface-scan geometry
— and on the cost model below, which it evaluates with the measured o.

Cost model, per OUTPUT CELL of a 3^3 conv at C_in=C_out=C (colwin
kernel, per-(tile,column) windows, CHUNK-row chunks):

  cell format (current):
    gather: 27 offsets x CHUNK x C  (one-hot matmul picks 1 row/offset)
    W:      27 x C x C
  dense-brick format (27 brick offsets: a [-1,1]-cell stencil on 2-cell
  bricks spans 3 bricks/axis; blocks (8C x 8C) mostly zero):
    per output BRICK: gather 27 x CHUNK_b x 8C, W 27 x 8C x 8C
    per cell (/8o):   gather 27 x CHUNK_b x C / o
                      W:      27 x 8 x C x C / o          <- 8/o times MORE
  block-sparse-brick (ideal kernel computing only the <=27 valid
  (q cell, p cell) pairs per brick-offset block):
    W per cell: 27 x C x C / o   (the padding waste is exactly 1/o)
    gather per cell: n_bo(o) x CHUNK_b x 8C / (8o), n_bo <= 27 nonempty
    brick offsets (measured: which of the 27 blocks have any valid pair
    — 8 when perfectly aligned, more otherwise).

So bricks trade (gather flops / 8o-ish) against (W flops x 1/o) plus an
engine rewrite. With gather/W = CHUNK/C_out (8x at C=64, 2x at C=256)
the trade only pays at high occupancy; this tool prints the measured o
per level and the resulting flop ratios, and optionally TIMES the
dense-brick conv (the existing generic kernel runs it: K3=27 offsets,
8C channels) against the cell conv at stage-1 shapes on the TPU.

Run:  python tools/brick_analysis.py [--time] [--scene surface]
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, '.')


def brick_occupancy(coords, mask):
    """coords (B, V, 3) int, mask (B, V) -> (mean cells/brick,
    n_bricks, n_cells) over the batch."""
    occ = []
    tot_b = tot_c = 0
    B = coords.shape[0]
    for b in range(B):
        c = np.asarray(coords[b][np.asarray(mask[b])])
        if not len(c):
            continue
        bricks = c // 2
        uniq = np.unique(bricks.astype(np.int64) @ np.array(
            [2 ** 42, 2 ** 21, 1], np.int64))
        occ.append(len(c) / len(uniq))
        tot_b += len(uniq)
        tot_c += len(c)
    return float(np.mean(occ)), tot_b, tot_c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scene', choices=('surface', 'uniform'),
                    default='surface')
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--time', action='store_true',
                    help='time dense-brick vs cell conv on the device')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from proxytransformation_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from proxytransformation_tpu.ops.sparse import (downsample_coords,
                                                    voxelize_points)
    from bench import _scene_points

    B, N = args.batch, 100_000
    pts = jnp.asarray(_scene_points(B, N, args.scene))
    mask = jnp.ones((B, N), bool)
    caps = (100_000, 80_000, 50_000, 20_000, 6_000, 2_000)
    lvl0 = jax.jit(lambda p, m: voxelize_points(
        p, m, p, voxel_size=0.01, capacity=caps[0]))(pts, mask)

    @jax.jit
    def _chain(l0):
        lv1 = downsample_coords(l0, caps[0])
        lv2 = downsample_coords(lv1, caps[1])
        s1 = downsample_coords(lv2, caps[2])
        s2 = downsample_coords(s1, caps[3])
        s3 = downsample_coords(s2, caps[4])
        s4 = downsample_coords(s3, caps[5])
        return lv1, lv2, s1, s2, s3, s4

    levels = {'lvl0_1cm': lvl0}
    lv1, lv2, s1, s2, s3, s4 = jax.block_until_ready(_chain(lvl0))
    levels.update(stem_2cm=lv1, pool_4cm=lv2, s1_8cm=s1, s2_16cm=s2,
                  s3_32cm=s3, s4_64cm=s4)

    CHUNK = 512           # cell kernel chunk at C<=128 (tuned)
    report = {'scene': args.scene}
    for name, lvl in levels.items():
        o8, nb, nc = brick_occupancy(np.asarray(lvl.coords),
                                     np.asarray(lvl.mask))
        o = o8 / 8.0
        # flop ratios per output cell at this level's stage width
        C = {'lvl0_1cm': 3, 'stem_2cm': 64, 'pool_4cm': 64, 's1_8cm': 64,
             's2_16cm': 128, 's3_32cm': 256, 's4_64cm': 512}[name]
        cell_g, cell_w = 27 * CHUNK * C, 27 * C * C
        # brick windows hold ~1/(8o) the rows of cell windows at the
        # same spatial size; CHUNK_b can shrink one step (512 -> 256)
        chunk_b = 256
        dense_g = 27 * chunk_b * C / o
        dense_w = 27 * 8 * C * C / o
        bs_g = 27 * chunk_b * C / o      # same windows, n_bo<=27
        bs_w = 27 * C * C / o
        report[name] = {
            'cells_per_brick': round(o8, 2),
            'occupancy': round(o, 3),
            'n_bricks': nb, 'n_cells': nc,
            'flops_ratio_dense_brick':
                round((dense_g + dense_w) / (cell_g + cell_w), 2),
            'flops_ratio_blocksparse_brick':
                round((bs_g + bs_w) / (cell_g + cell_w), 2),
        }
        print(json.dumps({name: report[name]}), flush=True)

    if args.time:
        from proxytransformation_tpu.ops.sparse import (SparseLevel,
                                                        build_neighbor_map)
        from proxytransformation_tpu.ops.sparse_conv_pallas import (
            sparse_conv_gather_gemm_colwin)
        from proxytransformation_tpu.utils.timing import chained_ms_per_iter

        # stage-1 self conv, cell format (the current hot conv)
        C = 64
        rng = np.random.RandomState(3)
        nbr = jax.jit(lambda a: build_neighbor_map(
            a, a, kernel_size=3, stride=1))(s1)
        feats = jnp.asarray(
            rng.randn(B, s1.capacity, C).astype(np.float32))
        feats = jnp.where(s1.mask[..., None], feats, 0.0)
        w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) / 24)

        def cell_step(i, st):
            f, = st
            out = sparse_conv_gather_gemm_colwin(f, nbr, w, s1.mask)
            return (f + 0.0001 * out, )

        ms_cell = chained_ms_per_iter(cell_step, (feats, ))
        print(json.dumps({'cell_conv_s1_ms': round(ms_cell, 2)}),
              flush=True)

        # dense-brick variant: pack s1 into 2^3 bricks host-side (one-
        # time setup, not timed) and run the SAME generic kernel with
        # 27 brick offsets at 8C channels — the kernel is shape-generic,
        # so no new code is needed to measure the format
        cap_b = s1.capacity // 2      # generous for o >= 0.25
        ext_b = tuple(-(-e // 2) for e in s1.extent)
        bf = np.zeros((B, cap_b, 8 * C), np.float32)
        bm = np.zeros((B, cap_b), bool)
        bc = np.zeros((B, cap_b, 3), np.int32)
        bk = np.full((B, cap_b), 2 ** 31 - 1, np.int32)
        f_np = np.asarray(feats)
        for b in range(B):
            m = np.asarray(s1.mask[b])
            cc = np.asarray(s1.coords[b])[m]
            ff = f_np[b][m]
            br = cc // 2
            sub = cc % 2
            slot = (sub[:, 0] * 2 + sub[:, 1]) * 2 + sub[:, 2]
            key = ((br[:, 0].astype(np.int64) * ext_b[1] + br[:, 1])
                   * ext_b[2] + br[:, 2])
            uk, first_idx, inv = np.unique(key, return_index=True,
                                           return_inverse=True)
            nbk = min(len(uk), cap_b)
            keep = inv < nbk
            # np.unique returns uk sorted ascending == sorted-key order
            view = bf[b].reshape(cap_b, 8, C)
            view[inv[keep], slot[keep]] = ff[keep]
            bm[b, :nbk] = True
            bc[b, :nbk] = br[first_idx[:nbk]]
            bk[b, :nbk] = uk[:nbk].astype(np.int32)
        blvl = SparseLevel(keys=jnp.asarray(bk), coords=jnp.asarray(bc),
                           feats=jnp.asarray(bf), mask=jnp.asarray(bm),
                           origin=s1.origin, extent=ext_b,
                           stride=s1.stride * 2,
                           voxel_size=s1.voxel_size)
        bnbr = jax.jit(lambda a: build_neighbor_map(
            a, a, kernel_size=3, stride=1))(blvl)
        wb = jnp.asarray(
            rng.randn(27, 8 * C, 8 * C).astype(np.float32) / 24)

        def brick_step(i, st):
            f, = st
            out = sparse_conv_gather_gemm_colwin(f, bnbr, wb, blvl.mask)
            return (f + 0.0001 * out, )

        ms_brick = chained_ms_per_iter(brick_step, (blvl.feats, ))
        print(json.dumps({'dense_brick_conv_s1_ms': round(ms_brick, 2),
                          'ratio_vs_cell': round(ms_brick / ms_cell, 2)}),
              flush=True)
        report['timing_s1_self_conv'] = {
            'cell_ms': round(ms_cell, 2),
            'dense_brick_ms': round(ms_brick, 2),
            'brick_capacity': cap_b,
        }

    with open('BRICK_ANALYSIS.json', 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps({'written': 'BRICK_ANALYSIS.json'}))


if __name__ == '__main__':
    main()
