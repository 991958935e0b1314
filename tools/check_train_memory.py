"""AOT compile-memory check for the CLI-built reference-scale train step.

VERDICT r4 #2's closing requirement: the B=6 train step built *through
the flagship config* (the exact model `tools/train.py CFG --amp`
constructs — not a hand-built bench model) must fit the 16 GB v5e HBM.
This compiles that step ahead-of-time and prints the compiler's own
memory analysis, failing loudly if the total exceeds the budget.

Reference workload: batch 6 / 100k pts / 20 views per device
(reference configs/grounding/proxy-...clip.py:146, trained with --amp,
reference tools/train.py:94-105).

Usage:  python tools/check_train_memory.py [--batch 6] [--no-amp]
Prints one JSON line; paste into BASELINE.md.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_BUDGET_GB = 16.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=6)
    ap.add_argument('--no-amp', action='store_true',
                    help='check the f32 path instead of --amp')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from proxytransformation_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import proxytransformation_tpu.models  # noqa: F401  (registry)
    from proxytransformation_tpu.utils.config import Config
    from proxytransformation_tpu.engine.runner import (apply_amp,
                                                       build_model_from_cfg)
    from proxytransformation_tpu.engine import (build_optimizer,
                                                create_train_state,
                                                make_train_step)
    from bench import _flagship_batch

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(
        repo, 'configs/grounding/proxy-tiblock33-gs12-wbias-ddr0.6-clip.py'))
    if not args.no_amp:
        apply_amp(cfg)   # what tools/train.py --amp does
    model = build_model_from_cfg(cfg['model'])

    B = args.batch
    batch = _flagship_batch(jnp, B, with_targets=True)
    variables = jax.eval_shape(
        lambda r, b: model.init(r, b, mode='loss', train=False),
        jax.random.PRNGKey(0), batch)
    tx = build_optimizer(variables['params'])
    state = jax.eval_shape(lambda v: create_train_state(model, v, tx),
                           variables)
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), (state, batch))
    compiled = jax.jit(make_train_step(model, tx),
                       donate_argnums=(0, )).lower(
        abstract[0], abstract[1], jax.random.PRNGKey(1)).compile()

    ma = compiled.memory_analysis()
    gb = 1024 ** 3
    out = {'workload': f'train_step B={B} '
                       f'{"amp" if not args.no_amp else "f32"} '
                       f'(config-built model, remat={model.remat})',
           'backend': jax.devices()[0].platform}
    if ma is None:
        out['error'] = 'memory_analysis unavailable on this backend'
        print(json.dumps(out))
        sys.exit(2)
    total = (ma.argument_size_in_bytes + ma.output_size_in_bytes +
             ma.temp_size_in_bytes + ma.generated_code_size_in_bytes -
             ma.alias_size_in_bytes)
    out.update({
        'argument_gb': round(ma.argument_size_in_bytes / gb, 2),
        'output_gb': round(ma.output_size_in_bytes / gb, 2),
        'temp_gb': round(ma.temp_size_in_bytes / gb, 2),
        'code_gb': round(ma.generated_code_size_in_bytes / gb, 2),
        'aliased_gb': round(ma.alias_size_in_bytes / gb, 2),
        'total_gb': round(total / gb, 2),
        'budget_gb': HBM_BUDGET_GB,
        'fits': total / gb < HBM_BUDGET_GB,
    })
    print(json.dumps(out))
    sys.exit(0 if out['fits'] else 1)


if __name__ == '__main__':
    main()
