"""Per-piece timing of the sparse 3D backbone at flagship scale.

backbone3d is the dominant cost of the full forward (339 ms of 514 at
B=2, round-3 profile — measured with --scene uniform, the then-default
workload; the current default is surface, so new runs are not directly
comparable to those numbers); this breaks it into neighbor-map builds,
downsamples, convolutions and norms at the real level shapes so the
next kernel target is chosen by measurement, not guess.

Run from /root/repo:  python tools/profile_sparse.py [--batch 2]
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--scene', choices=('surface', 'uniform'),
                    default='surface')
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp
    from proxytransformation_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from proxytransformation_tpu.utils.timing import chained_ms_per_iter
    from proxytransformation_tpu.ops.sparse import (
        voxelize_points, downsample_coords, build_neighbor_map,
        sparse_conv)

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

    results = {}

    def record(name, ms):
        results[name] = round(ms, 2)
        print(json.dumps({'component': name, 'ms': results[name]}),
              flush=True)

    # build the level chain once (stem s2, pool s2, stages s2 each)
    make_chain = jax.jit(lambda l0: _chain(l0, caps, downsample_coords))

    def _chain(l0, caps, ds):
        lv1 = ds(l0, caps[0])        # stem out (stride 2)
        lv2 = ds(lv1, caps[1])       # pool out
        st = [lv2]
        for i in range(4):
            st.append(ds(st[-1], caps[2 + i]))
        return (lv1, lv2, st[1], st[2], st[3], st[4])

    chain = make_chain(lvl0)
    lv1, lv2, s1, s2, s3, s4 = jax.block_until_ready(chain)
    print(json.dumps({'valid_counts': [
        int(jnp.sum(l.mask[0])) for l in (lvl0, lv1, lv2, s1, s2, s3, s4)
    ]}), flush=True)

    # ---- neighbor-map builds at real shapes ----
    def time_map(name, src, dst, k, s):
        def step(i, st_):
            f, = st_
            nbr = build_neighbor_map(
                src._replace(keys=src.keys + (f[0, 0] > 1e9).astype(
                    jnp.int32)), dst, kernel_size=k, stride=s)
            return (f + 1e-6 * jnp.mean(nbr.astype(jnp.float32)), )
        record(name, chained_ms_per_iter(
            step, (jnp.zeros((1, 8), jnp.float32), ), n_short=1, n_long=4))

    time_map('map_stem_k3s2_100k', lvl0, lv1, 3, 2)
    time_map('map_pool_k2s2', lv1, lv2, 2, 2)
    time_map('map_stage1_strided', lv2, s1, 3, 2)
    time_map('map_stage1_self_50k', s1, s1, 3, 1)
    time_map('map_stage2_self_20k', s2, s2, 3, 1)
    time_map('map_stage3_self_6k', s3, s3, 3, 1)
    time_map('map_stage4_self_2k', s4, s4, 3, 1)

    # ---- downsample_coords ----
    def step_ds(i, st_):
        f, = st_
        lv = downsample_coords(
            lvl0._replace(keys=lvl0.keys + (f[0, 0] > 1e9).astype(
                jnp.int32)), caps[0])
        return (f + 1e-6 * jnp.mean(lv.keys.astype(jnp.float32)), )
    record('downsample_100k', chained_ms_per_iter(
        step_ds, (jnp.zeros((1, 8), jnp.float32), ), n_short=1, n_long=4))

    # ---- convs at stage shapes (self maps, Pallas on TPU) ----
    def time_conv(name, lvl, cin, cout):
        nbr = jax.jit(lambda a, b: build_neighbor_map(
            a, b, kernel_size=3, stride=1))(lvl, lvl)
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.05)
        f0 = jnp.asarray(
            rng.randn(B, lvl.capacity, cin).astype(np.float32))

        def step(i, st_):
            f, = st_
            out = sparse_conv(f, nbr, w, lvl.mask, self_map=True)
            if cin == cout:
                return (f + 0.001 * out, )
            return (f + 0.001 * jnp.mean(out, -1, keepdims=True), )
        record(name, chained_ms_per_iter(step, (f0, ), n_short=1,
                                         n_long=4))

    time_conv('conv_s1_50k_64', s1, 64, 64)
    time_conv('conv_s2_20k_128', s2, 128, 128)
    time_conv('conv_s3_6k_256', s3, 256, 256)
    time_conv('conv_s4_2k_512', s4, 512, 512)

    # ---- the convs the per-stage loop above does NOT cover ----
    # stem conv: 3->64 over the k3 s2 map at ~96k output rows — same
    # per-row one-hot gather cost as a 64ch conv (C_in pads to 128)
    def time_conv_strided(name, src, dst, cin, cout, k=3, s=2):
        nbr = jax.jit(lambda a, b: build_neighbor_map(
            a, b, kernel_size=k, stride=s))(src, dst)
        w = jnp.asarray(rng.randn(nbr.shape[-1], cin, cout).astype(
            np.float32) * 0.05)
        f0 = jnp.asarray(
            rng.randn(B, src.capacity, cin).astype(np.float32))

        def step(i, st_):
            f, = st_
            out = sparse_conv(f, nbr, w, dst.mask)
            # scalar feedback: dst rows != src rows for strided maps,
            # so a per-row mean cannot be added back onto f
            return (f + 0.001 * jnp.mean(out), )
        record(name, chained_ms_per_iter(step, (f0, ), n_short=1,
                                         n_long=4))

    time_conv_strided('conv_stem_3to64_96k', lvl0, lv1, 3, 64)
    time_conv_strided('conv_s1_strided_64', lv2, s1, 64, 64)
    time_conv_strided('conv_s2_strided_128', s1, s2, 64, 128)
    time_conv_strided('conv_s3_strided_256', s2, s3, 128, 256)
    time_conv_strided('conv_s4_strided_512', s3, s4, 256, 512)

    # max pool over the k2 s2 map (stem -> pool level)
    from proxytransformation_tpu.ops.sparse import sparse_max_pool
    pnbr = jax.jit(lambda a, b: build_neighbor_map(
        a, b, kernel_size=2, stride=2))(lv1, lv2)
    fp = jnp.asarray(rng.randn(B, lv1.capacity, 64).astype(np.float32))

    def step_pool(i, st_):
        f, = st_
        out = sparse_max_pool(f, pnbr, lv2.mask)
        # scalar feedback: pool dst rows != src rows
        return (f + 0.001 * jnp.mean(out), )
    record('maxpool_96k_64', chained_ms_per_iter(step_pool, (fp, ),
                                                 n_short=1, n_long=4))

    # ---- norms at the big stage shape ----
    from proxytransformation_tpu.models.sparse_resnet import (
        MaskedBatchNorm, MaskedInstanceNorm)
    f0 = jnp.asarray(rng.randn(B, s1.capacity, 64).astype(np.float32))
    for cls, name in ((MaskedBatchNorm, 'bn_50k_64'),
                      (MaskedInstanceNorm, 'in_50k_64')):
        mod = cls()
        v = mod.init(jax.random.PRNGKey(0), f0, s1.mask, False)

        def step(i, st_):
            f, = st_
            out = mod.apply(v, f, s1.mask, False)
            return (f + 0.001 * out, )
        record(name, chained_ms_per_iter(step, (f0, ), n_short=1,
                                         n_long=4))

    print(json.dumps({'batch': B, 'summary': results}), flush=True)


if __name__ == '__main__':
    main()
