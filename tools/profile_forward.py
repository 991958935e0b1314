"""Per-component timing of the flagship full forward (real chip).

Breaks the B=2 / 100k-pt / 20-view predict path into its stages and
times each with the honest chained-timing harness
(utils/timing.py::chained_ms_per_iter — see BASELINE.md note on the
axon tunnel's unreliable block_until_ready). Residuals attribute what
cannot be isolated without re-plumbing (painting+neck inside
extract_feat; decoder+head relative to the full forward).

Run from /root/repo:  python tools/profile_forward.py [--batch 2]

Prints one JSON line per component and a closing summary line.
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--stage', default='all',
                    help='comma list: text,backbone2d,preshape,voxelize,'
                         'backbone3d,extract,full')
    args = ap.parse_args()
    B = args.batch
    want = set(args.stage.split(','))

    import jax
    import jax.numpy as jnp
    from proxytransformation_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from proxytransformation_tpu.utils.timing import chained_ms_per_iter
    from bench import _flagship_batch, _flagship_model

    model = _flagship_model()
    batch = _flagship_batch(jnp, B)
    variables = jax.jit(
        lambda rng, b: model.init(rng, b, mode='predict'))(
            jax.random.PRNGKey(0), batch)

    results = {}

    def record(name, ms):
        results[name] = round(ms, 2)
        print(json.dumps({'component': name, 'ms': results[name]}),
              flush=True)

    rng = np.random.RandomState(0)
    text_feats = jnp.asarray(
        rng.randn(B, batch['input_ids'].shape[1],
                  model.embed_dims).astype(np.float32))

    if 'all' in want or 'text' in want:
        def step_text(i, st):
            ids, v = st
            tf = model.apply(v, ids, batch['text_mask'],
                             method='encode_text')
            return (ids ^ (jnp.mean(tf) > 1e9).astype(jnp.int32), v)
        record('text_encoder', chained_ms_per_iter(
            step_text, (batch['input_ids'], variables), n_short=1,
            n_long=5))

    if 'all' in want or 'backbone2d' in want:
        imgs = batch['imgs'].reshape(-1, *batch['imgs'].shape[2:])

        def step_bb2(i, st):
            im, v = st
            feats = model.apply(v, im,
                                method=lambda m, x: m.backbone(x))
            return (im + 1e-6 * jnp.mean(feats[-1]), v)
        record('backbone2d_40x480', chained_ms_per_iter(
            step_bb2, (imgs, variables), n_short=1, n_long=3))

    if 'all' in want or 'preshape' in want:
        img_last = jnp.asarray(
            rng.randn(B, 20, 15, 15, 512).astype(np.float32))

        def step_pre(i, st):
            pts, v = st
            out, m = model.apply(
                v, pts, batch['points_mask'], text_feats,
                batch['text_mask'], img_last, False,
                method=lambda mdl, *a: mdl.preshape(*a[:-1],
                                                    train=a[-1]))
            return (pts + 1e-6 * jnp.where(m[..., None], out - pts, 0.0),
                    v)
        record('preshape', chained_ms_per_iter(
            step_pre, (batch['points'][..., :3], variables), n_short=1,
            n_long=5))

    from proxytransformation_tpu.ops.sparse import voxelize_points
    lvl0 = None
    if not {'all', 'voxelize', 'backbone3d', 'paint', 'neck',
            'neckpaint'}.isdisjoint(want):
        vox = jax.jit(lambda p, m: voxelize_points(
            p, m, p, voxel_size=model.voxel_size, capacity=model.n_points,
            extent=tuple(model.voxel_extent)))
        lvl0 = vox(batch['points'][..., :3], batch['points_mask'])

    if 'all' in want or 'voxelize' in want:
        def step_vox(i, st):
            pts, m = st
            lv = voxelize_points(pts, m, pts, voxel_size=model.voxel_size,
                                 capacity=model.n_points,
                                 extent=tuple(model.voxel_extent))
            return (pts + 1e-6 * jnp.mean(lv.feats), m)
        record('voxelize', chained_ms_per_iter(
            step_vox, (batch['points'][..., :3], batch['points_mask']),
            n_short=1, n_long=5))

    if 'all' in want or 'backbone3d' in want:
        def step_bb3(i, st):
            feats, v = st
            lv = lvl0._replace(feats=feats)
            levels, _ = model.apply(
                v, lv, method=lambda m, x: m.backbone_3d(
                    x, train=False, return_self_maps=True))
            return (feats + 1e-6 * jnp.mean(levels[-1].feats), v)
        record('backbone3d', chained_ms_per_iter(
            step_bb3, (lvl0.feats, variables), n_short=1, n_long=3))

    if not {'paint', 'neck', 'neckpaint'}.isdisjoint(want):
        # real level chain + painted features, computed once
        from proxytransformation_tpu.models.point_fusion import (
            batch_point_sample)
        H, W = batch['imgs'].shape[2:4]

        @jax.jit
        def _levels(v, lv, b):
            levels, smaps = model.apply(
                v, lv, method=lambda m, x: m.backbone_3d(
                    x, train=False, return_self_maps=True))
            feats2d = model.apply(
                v, b['imgs'].reshape(-1, H, W, 3),
                method=lambda m, x: m.backbone(x))
            feats2d = [f.reshape((B, -1) + f.shape[1:]) for f in feats2d]
            return levels, smaps, feats2d

        levels, smaps, feats2d = jax.block_until_ready(
            _levels(variables, lvl0, batch))

        if 'paint' in want:
            def step_paint(i, st):
                lvls, f2d = st
                painted = []
                for li, lv in enumerate(lvls):
                    xyz = lv.world_xyz()
                    f = jax.vmap(
                        lambda imf, p, proj, vm, vmask: batch_point_sample(
                            imf, p, proj, (H, W), img_scale_factor=None,
                            valid_mask=vm, views_mask=vmask,
                            aligned=False))(
                        f2d[li], xyz, batch['proj_mats'], lv.mask,
                        batch['views_mask'])
                    painted.append(f)
                bump = 1e-6 * jnp.mean(painted[0])
                return ([lv._replace(feats=lv.feats + bump)
                         for lv in lvls], f2d)
            record('painting_4lvl', chained_ms_per_iter(
                step_paint, (levels, feats2d), n_short=1, n_long=4))

        if 'neck' in want:
            painted = [
                lv._replace(feats=jnp.concatenate([
                    lv.feats,
                    jnp.zeros(lv.feats.shape[:-1]
                              + (feats2d[li].shape[-1], ))], -1))
                for li, lv in enumerate(levels)]

            def step_neck(i, st):
                plv, v = st
                out = model.apply(v, plv, method=lambda m, x: m.neck_3d(
                    x, train=False, self_maps=smaps))
                bump = 1e-6 * jnp.mean(out[0])
                return ([lv._replace(feats=lv.feats + bump)
                         for lv in plv], v)
            record('neck_3d', chained_ms_per_iter(
                step_neck, (painted, variables), n_short=1, n_long=4))

        if 'neckpaint' in want:
            # the REAL configuration: painting threaded through the
            # neck via paint_fn, running on the post-compaction sets —
            # this is what the extract_feat residual actually measures
            def step_np(i, st):
                lvls, f2d, v = st

                def paint_fn(xyz, vmask, lvl_idx):
                    return jax.vmap(
                        lambda imf, p, proj, vm, vmask_: batch_point_sample(
                            imf, p, proj, (H, W), img_scale_factor=None,
                            valid_mask=vm, views_mask=vmask_,
                            aligned=False))(
                        f2d[lvl_idx], xyz, batch['proj_mats'], vmask,
                        batch['views_mask'])

                out = model.apply(v, lvls, False, smaps, paint_fn,
                                  method=lambda m, x, tr, sm, pf:
                                  m.neck_3d(x, train=tr, self_maps=sm,
                                            paint_fn=pf))
                bump = 1e-6 * jnp.mean(out[0])
                return ([lv._replace(feats=lv.feats + bump)
                         for lv in lvls], f2d, v)
            record('neck_with_paint', chained_ms_per_iter(
                step_np, (levels, feats2d, variables), n_short=1,
                n_long=4))

    if 'all' in want or 'extract' in want:
        def step_ex(i, st):
            b, v = st
            feats, scores, xyz, fm = model.apply(
                v, b, text_feats, False, method='extract_feat')
            b = dict(b)
            b['points'] = b['points'] + 1e-6 * jnp.mean(feats)
            return (b, v)
        record('extract_feat_total', chained_ms_per_iter(
            step_ex, (batch, variables), n_short=1, n_long=3))

    if 'all' in want or 'full' in want:
        def step_full(i, st):
            b, v = st
            out = model.apply(v, b, mode='predict')
            b = dict(b)
            b['points'] = b['points'] + 1e-6 * jnp.mean(out['scores_3d'])
            return (b, v)
        record('full_forward', chained_ms_per_iter(
            step_full, (batch, variables), n_short=1, n_long=3))

    if {'extract_feat_total', 'backbone2d_40x480', 'preshape',
            'voxelize', 'backbone3d'} <= set(results):
        results['paint_plus_neck_residual'] = round(
            results['extract_feat_total'] - results['backbone2d_40x480']
            - results['preshape'] - results['voxelize']
            - results['backbone3d'], 2)
    if {'full_forward', 'extract_feat_total',
            'text_encoder'} <= set(results):
        results['decoder_head_residual'] = round(
            results['full_forward'] - results['extract_feat_total']
            - results['text_encoder'], 2)
    print(json.dumps({'batch': B, 'summary': results}), flush=True)


if __name__ == '__main__':
    main()
