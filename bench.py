"""Benchmark: ProxyTransformation preshape fwd + full-model fwd + train step.

Three honest measurements on whatever backend is available (the real
TPU under the driver):

  1. preshape fwd — BASELINE.json config #3 ("full ProxyTransformation
     module: text + multi-view image proxies, batch=4 scenes") at the
     reference scale (grid 12 → 1728 clusters, dynamic_drop 0.6, 100k
     points, 20 views, CLIP-text dims). Primary metric; `vs_baseline`
     anchors to the round-1 TPU number (BASELINE.md).
  2. full detector forward (extract_feat + decoder + head, predict
     path) at flagship scale.
  3. jitted train step (loss + grads + AdamW update) at the reference
     per-device config (B=6, 100k pts, 20 views — configs/...clip.py:146),
     falling back to a smaller B on OOM with the B used reported.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
the secondary measurements as extra keys.

Timing note: this environment's remote TPU backend returns from
`block_until_ready` before execution completes, so all numbers use
`utils/timing.py::chained_ms_per_iter` (N data-dependent in-jit
iterations + scalar readback, two chain lengths differenced).
"""
import json
import sys
import traceback

import numpy as np

# Anchor for vs_baseline: the honest round-1 TPU measurement of the
# preshape module (see BASELINE.md). The PyTorch reference's
# CUDA/MinkowskiEngine stack cannot run in this environment and the
# repo publishes no numbers, so improvements are tracked against our
# own first honest measurement (round 1: 176 scenes/s with the Pallas
# ball-query kernel; the pure-XLA formulation before it: 4.6).
BASELINE_SCENES_PER_SEC = 176.0


def bench_preshape(jax, jnp, chained_ms_per_iter):
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
    variables = jax.jit(
        lambda k: model.init(k, pts, mask, text, tmask, img,
                             train=False))(jax.random.PRNGKey(0))

    def step(i, state):
        p, v, im = state
        out, m = model.apply(v, p, mask, text, tmask, im, train=False)
        return (p + 0.0001 * jnp.where(m[..., None], out - p, 0.0), v, im)

    ms = chained_ms_per_iter(step, (pts, variables, img))
    return B / (ms / 1e3), ms


def _flagship_batch(jnp, B, n_points=100_000, V=20, H=480, W=480, L=32,
                    with_targets=False, max_text_len=256):
    rng = np.random.RandomState(0)
    proj = np.tile(
        np.array([[400, 0, W / 2, 0], [0, 400, H / 2, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float32), (B, V, 1, 1))
    batch = {
        'imgs': jnp.asarray(rng.randn(B, V, H, W, 3).astype(np.float32)),
        'points': jnp.asarray(
            rng.uniform(0, 6.0, (B, n_points, 3)).astype(np.float32)),
        'points_mask': jnp.ones((B, n_points), bool),
        'input_ids': jnp.asarray(rng.randint(0, 49408, (B, L)), jnp.int32),
        'text_mask': jnp.ones((B, L), bool),
        'proj_mats': jnp.asarray(proj),
        'views_mask': jnp.ones((B, V), bool),
    }
    if with_targets:
        G = 8
        gt = np.concatenate([
            rng.uniform(1, 5, (B, G, 3)),
            rng.uniform(0.3, 1.5, (B, G, 3)),
            rng.uniform(-0.5, 0.5, (B, G, 3))], -1).astype(np.float32)
        pm = np.zeros((B, G, max_text_len), np.float32)
        pm[:, :, 1] = 1.0
        batch.update({
            'gt_bboxes': jnp.asarray(gt),
            'gt_masks': jnp.ones((B, G), bool),
            'positive_maps': jnp.asarray(pm),
        })
    return batch


def _flagship_model(remat=False):
    from proxytransformation_tpu.models.detector import (
        SparseFeatureFusion3DGrounderPreshape)
    # reference defaults; remat for the big train batches
    return SparseFeatureFusion3DGrounderPreshape(remat=remat)


def bench_full_forward(jax, jnp, chained_ms_per_iter, B=2):
    model = _flagship_model()
    batch = _flagship_batch(jnp, B)
    variables = jax.jit(
        lambda rng, b: model.init(rng, b, mode='predict'))(
            jax.random.PRNGKey(0), batch)

    # thread variables AND the batch through the chain state — anything
    # the step closes over becomes an HLO constant, and 50+ MB of
    # embedded images makes the remote compile pathological (observed:
    # >60 min; the tunnel also 413s on huge uploads)
    def step(i, state):
        b, v = state
        out = model.apply(v, b, mode='predict')
        b = dict(b)
        b['points'] = b['points'] + 1e-6 * jnp.mean(out['scores_3d'])
        return (b, v)

    ms = chained_ms_per_iter(step, (batch, variables), n_short=1,
                             n_long=3)
    return B / (ms / 1e3), ms, B


def bench_train_step(jax, jnp, chained_ms_per_iter, B=6):
    from proxytransformation_tpu.engine import (build_optimizer,
                                                create_train_state,
                                                make_train_step)
    model = _flagship_model(remat=B >= 4)
    batch = _flagship_batch(jnp, B, with_targets=True)
    variables = jax.jit(
        lambda rng, b: model.init(rng, b, mode='loss', train=False))(
            jax.random.PRNGKey(0), batch)
    tx = build_optimizer(variables['params'])
    state = create_train_state(model, variables, tx)
    train_step = make_train_step(model, tx)
    rng = jax.random.PRNGKey(1)

    def step(i, carry):
        s, b = carry
        new_s, _ = train_step(s, b, rng)
        return (new_s, b)

    ms = chained_ms_per_iter(step, (state, batch), n_short=1, n_long=3)
    return B / (ms / 1e3), ms, B


def _run_stage(stage: str):
    """Run one measurement in-process and print ONE JSON line."""
    import jax
    from proxytransformation_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from proxytransformation_tpu.utils.timing import chained_ms_per_iter

    if stage == 'preshape':
        sps, ms = bench_preshape(jax, jnp, chained_ms_per_iter)
        print(json.dumps({'scenes_per_sec': round(sps, 2),
                          'ms': round(ms, 2)}))
        return
    if stage.startswith('full_forward'):
        B = int(stage.split(':')[1])
        sps, ms, used = bench_full_forward(jax, jnp, chained_ms_per_iter,
                                           B)
        print(json.dumps({'scenes_per_sec': round(sps, 2),
                          'ms': round(ms, 1), 'batch': used}))
        return
    if stage.startswith('train_step'):
        B = int(stage.split(':')[1])
        sps, ms, used = bench_train_step(jax, jnp, chained_ms_per_iter, B)
        print(json.dumps({'scenes_per_sec': round(sps, 2),
                          'ms': round(ms, 1), 'batch': used}))
        return
    raise ValueError(stage)


def _stage_subprocess(stage: str, timeout_s: int):
    """Run a stage in a subprocess (a hung remote compile must not take
    the whole benchmark down); returns its parsed JSON or None."""
    import os
    import subprocess
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), '--stage', stage],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=timeout_s)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            return None
        line = proc.stdout.strip().splitlines()[-1]
        return json.loads(line)
    except Exception:
        traceback.print_exc(file=sys.stderr)
        return None


def main():
    if '--stage' in sys.argv:
        _run_stage(sys.argv[sys.argv.index('--stage') + 1])
        return

    extra = {}
    pre = _stage_subprocess('preshape', 2400)
    preshape_sps = (pre or {}).get('scenes_per_sec', 0.0)
    if pre:
        extra['preshape_fwd_ms_b4'] = pre['ms']

    ff = _stage_subprocess('full_forward:2', 3600) \
        or _stage_subprocess('full_forward:1', 2400)
    if ff:
        extra['full_forward_scenes_per_sec'] = ff['scenes_per_sec']
        extra['full_forward_ms'] = ff['ms']
        extra['full_forward_batch'] = ff['batch']
    else:
        extra['full_forward_scenes_per_sec'] = None

    # B=6 (the reference per-GPU batch) currently OOM-kills the remote
    # XLA compile helper (HTTP 500 SIGKILL after ~25 min); opt in via
    # BENCH_TRY_B6=1 — the recorded metric uses B=2 until remat lands
    import os as _os
    ts = None
    if _os.environ.get('BENCH_TRY_B6'):
        ts = _stage_subprocess('train_step:6', 3600)
    ts = ts or _stage_subprocess('train_step:2', 3600)
    if ts:
        extra['train_step_scenes_per_sec'] = ts['scenes_per_sec']
        extra['train_step_ms'] = ts['ms']
        extra['train_step_batch'] = ts['batch']
    else:
        extra['train_step_scenes_per_sec'] = None

    print(json.dumps(dict({
        'metric': 'proxy_transformation_fwd_scenes_per_sec_per_chip',
        'value': round(preshape_sps, 2),
        'unit': 'scenes/s',
        'vs_baseline': round(preshape_sps / BASELINE_SCENES_PER_SEC, 3),
    }, **extra)))


if __name__ == '__main__':
    main()
