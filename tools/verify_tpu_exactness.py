"""On-TPU bit-exactness record for the round-4 Pallas kernels.

Round 4 shipped three kernels whose correctness evidence was
interpret-mode-only at toy shapes (VERDICT r4 weak #5). This harness
runs them at REFERENCE shapes on the real chip against their XLA
oracles and writes a committed artifact (TPU_EXACTNESS.json):

 1. ball_query_idx_pallas (ops/ball_query_pallas.py — dynamic
    [min(count), max(count+hits)) slot window, repeated-center tail
    padding) vs ops/ball_query._ball_query_idx at the preshape shape
    (B=4, 1728 grid-prior centers x 100k points, K=30, r=3) on both
    scene regimes. Indices are ints: the check is EXACT equality.
    The two paths compute the same per-coordinate subtract-square f32
    expression, so the radius boundary rounds identically by design.
 2. The occupancy-flag skip in sparse_conv_gather_gemm_colwin
    (ops/sparse_conv_pallas.py): flags-on vs all_active=True at real
    backbone level shapes built from a surface scan — the skipped
    (tile, column) pairs must contribute exact zeros, so the outputs
    must be BIT-IDENTICAL (f32 equality).
 3. The same convs vs the XLA sparse_conv_apply oracle: inputs are
    bf16-rounded so every gathered value and MXU product is exact;
    only f32 accumulation order differs between the chunked kernel and
    the offset scan -> tight rtol.

Run from /root/repo on the TPU:  python tools/verify_tpu_exactness.py
(pass --interpret to smoke-test the harness itself on CPU).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def _bf16_round(x):
    import jax.numpy as jnp
    return np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(
        jnp.float32))


def check_ball_query(jax, jnp, scene, results, interpret=False):
    from proxytransformation_tpu.ops.ball_query import _ball_query_idx
    from proxytransformation_tpu.ops.ball_query_pallas import (
        ball_query_idx_pallas)
    from bench import _scene_points

    if interpret:  # CPU harness smoke: interpret mode is per-element
        B, N, M, K = 2, 4096, 160, 8
    else:
        B, N, M, K = 4, 100_000, 12 ** 3, 30
    pts_np = _scene_points(B, N, scene, low=-5.0, high=5.0)
    rng = np.random.RandomState(1)
    lo, hi = pts_np.min(axis=(0, 1)), pts_np.max(axis=(0, 1))
    centers = jnp.asarray(
        rng.uniform(lo, hi, (B, M, 3)).astype(np.float32))
    pts = jnp.asarray(pts_np)
    # invalid tail like a real padded cloud
    mask = jnp.ones((B, N), bool).at[:, N - max(N // 13, 1):].set(False)
    r2 = jnp.asarray(9.0, jnp.float32)

    got = np.asarray(ball_query_idx_pallas(centers, pts, mask, r2, K,
                                           interpret=interpret))
    ref = np.asarray(_ball_query_idx(centers, pts, mask, r2, K, 2048))
    mism = int((got != ref).sum())
    hits = int((ref >= 0).sum())
    results[f'ball_query_{scene}'] = {
        'ok': mism == 0, 'n_mismatch': mism,
        'n_hit_slots': hits, 'shape': list(ref.shape),
    }
    print(json.dumps({f'ball_query_{scene}': results[f'ball_query_{scene}']}),
          flush=True)


def check_convs(jax, jnp, interpret, results):
    from proxytransformation_tpu.data.synthetic import surface_scene_batch
    from proxytransformation_tpu.ops.sparse import (
        build_neighbor_map, downsample_coords, sparse_conv_apply,
        voxelize_points)
    from proxytransformation_tpu.ops.sparse_conv_pallas import (
        sparse_conv_gather_gemm_colwin)

    B, N = 2, 100_000
    pts = jnp.asarray(surface_scene_batch(B, N, seed=0))
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
        return lv1, lv2, s1, s2, s3

    lv1, lv2, s1, s2, s3 = jax.block_until_ready(_chain(lvl0))
    rng = np.random.RandomState(2)

    cases = [
        # (name, in_level, out_level, stride, C_in, C_out)
        ('stem_strided_3to64', lvl0, lv1, 2, 3, 64),
        ('s1_self_64', s1, s1, 1, 64, 64),
        ('s2_self_128', s2, s2, 1, 128, 128),
        ('s3_self_256', s3, s3, 1, 256, 256),
    ]
    for name, lin, lout, stride, cin, cout in cases:
        nbr = jax.jit(lambda a, b: build_neighbor_map(
            a, b, kernel_size=3, stride=stride))(lin, lout)
        feats = jnp.asarray(_bf16_round(
            rng.randn(B, lin.mask.shape[1], cin).astype(np.float32)))
        feats = jnp.where(lin.mask[..., None], feats, 0.0)
        w = jnp.asarray(_bf16_round(
            (rng.randn(27, cin, cout) / np.sqrt(9 * cin)).astype(
                np.float32)))
        flags = np.asarray(sparse_conv_gather_gemm_colwin(
            feats, nbr, w, lout.mask, interpret=interpret))
        noflags = np.asarray(sparse_conv_gather_gemm_colwin(
            feats, nbr, w, lout.mask, interpret=interpret,
            all_active=True))
        bit_identical = bool((flags == noflags).all())
        oracle = np.asarray(sparse_conv_apply(feats, nbr, w, lout.mask))
        scale = np.abs(oracle).max() or 1.0
        max_rel = float(np.abs(flags - oracle).max() / scale)
        n_valid = int(np.asarray(lout.mask).sum())
        results[f'conv_{name}'] = {
            'ok': bit_identical and max_rel < 1e-5,
            'flag_skip_bit_identical': bit_identical,
            'max_rel_vs_xla_oracle': max_rel,
            'valid_out_voxels': n_valid,
            'capacity': int(lout.mask.shape[1]),
        }
        print(json.dumps({f'conv_{name}': results[f'conv_{name}']}),
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--interpret', action='store_true',
                    help='CPU smoke of the harness itself')
    ap.add_argument('--out', default='TPU_EXACTNESS.json')
    args = ap.parse_args()

    import jax
    if args.interpret:
        jax.config.update('jax_platforms', 'cpu')
    from proxytransformation_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    results = {
        'backend': jax.default_backend(),
        'device': str(jax.devices()[0]),
        'date': time.strftime('%Y-%m-%d'),
        'command': 'python tools/verify_tpu_exactness.py',
    }
    check_ball_query(jax, jnp, 'uniform', results, args.interpret)
    check_ball_query(jax, jnp, 'surface', results, args.interpret)
    check_convs(jax, jnp, args.interpret, results)

    ok = all(v.get('ok', True) for v in results.values()
             if isinstance(v, dict))
    results['all_ok'] = ok
    with open(args.out, 'w') as f:
        json.dump(results, f, indent=1)
    print(json.dumps({'all_ok': ok, 'written': args.out}))
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
