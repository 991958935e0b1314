"""Per-component timing of the train-step backward (real chip).

The B=2 step is 915 ms vs a 320 ms forward; this times value_and_grad
of each major component at real shapes so backward work is directed by
measurement (the round-2 IoU surprise). Components: 2D ResNet, sparse
backbone convs, painting+neck, preshape, decoder+head loss.

Run from /root/repo:  python tools/profile_backward.py [--batch 2]
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--dtype', default='bfloat16')
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp
    from proxytransformation_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from proxytransformation_tpu.utils.timing import chained_ms_per_iter

    rng = np.random.RandomState(0)
    results = {}

    def record(name, ms):
        results[name] = round(ms, 2)
        print(json.dumps({'component': name, 'ms': results[name]}),
              flush=True)

    def time_grad(name, fn, params, *args_):
        """chained timing of value_and_grad(fn)(params, *args_)."""
        vg = jax.value_and_grad(fn)

        def step(i, state):
            p = state
            val, g = vg(p, *args_)
            return jax.tree_util.tree_map(
                lambda a, b: a + 1e-7 * b.astype(a.dtype), p, g)

        ms = chained_ms_per_iter(step, params, n_short=1, n_long=3)
        record(name, ms)

    cdt = jnp.dtype(args.dtype)

    # ---- 2D ResNet fwd+bwd (40 x 480^2) ----
    from proxytransformation_tpu.models.resnet import ResNet
    res = ResNet(depth=50, base_channels=16, dtype=cdt)
    imgs = jnp.asarray(rng.randn(B * 20, 480, 480, 3), jnp.float32)
    rv = jax.jit(lambda k: res.init(k, imgs))(jax.random.PRNGKey(0))

    def res_loss(p, x):
        outs = res.apply({'params': p, 'batch_stats': rv['batch_stats']}, x)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    time_grad('resnet2d_fwdbwd', res_loss, rv['params'], imgs)

    # ---- sparse backbone fwd+bwd ----
    from proxytransformation_tpu.models.sparse_resnet import MinkResNet
    from proxytransformation_tpu.ops.sparse import voxelize_points
    pts = jnp.asarray(rng.uniform(0, 6.0, (B, 100_000, 3)), jnp.float32)
    mask = jnp.ones((B, 100_000), bool)
    lvl0 = voxelize_points(pts, mask, pts, voxel_size=0.01,
                           capacity=100_000)
    bb = MinkResNet(depth=34, in_channels=3, dtype=cdt)
    bv = jax.jit(lambda k: bb.init(k, lvl0, train=False))(
        jax.random.PRNGKey(0))

    def bb_loss(p, l0):
        outs = bb.apply({'params': p, 'batch_stats': bv['batch_stats']},
                        l0, train=False)
        return sum(jnp.sum(o.feats.astype(jnp.float32) ** 2) for o in outs)

    time_grad('backbone3d_fwdbwd', bb_loss, bv['params'], lvl0)

    # ---- painting fwd+bwd (all 4 levels, grads to image features) ----
    from proxytransformation_tpu.models.point_fusion import (
        batch_point_sample)
    level_caps = (50_000, 20_000, 6_000, 2_000)
    img_chans = (64, 128, 256, 512)
    feat_hw = (120, 60, 30, 15)
    proj = jnp.asarray(np.tile(
        np.array([[400, 0, 240, 0], [0, 400, 240, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float32), (B, 20, 1, 1)))
    vm = jnp.ones((B, 20), bool)
    lvls = [voxelize_points(pts, mask, pts, voxel_size=0.01 * 2 ** (i + 3),
                            capacity=c, extent=(160, 160, 64))
            for i, c in enumerate(level_caps)]
    imfs = {f'l{i}': jnp.asarray(
        rng.randn(B, 20, hw, hw, C).astype(np.float32) * 0.1)
        for i, (hw, C) in enumerate(zip(feat_hw, img_chans))}

    def paint_loss(imfs_):
        tot = 0.0
        for i, lvl in enumerate(lvls):
            out = jax.vmap(lambda f, p, pj, m_, v_: batch_point_sample(
                f, p, pj, (480, 480), valid_mask=m_, views_mask=v_,
                aligned=False))(imfs_[f'l{i}'].astype(cdt),
                                lvl.world_xyz(), proj, lvl.mask, vm)
            tot = tot + jnp.sum(out.astype(jnp.float32) ** 2)
        return tot

    time_grad('painting_fwdbwd', paint_loss, imfs)

    # decoder+head backward is reported as the residual of the full
    # train step minus the components above (its wiring — shared reg
    # branches inside the detector module tree — is not reachable
    # standalone).

    print(json.dumps({'batch': B, 'dtype': args.dtype,
                      'summary': results}), flush=True)


if __name__ == '__main__':
    main()
