"""Training CLI (reference surface: tools/train.py).

Usage:
    python tools/train.py CONFIG [--work-dir DIR] [--resume [auto|PATH]]
        [--cfg-options k=v ...] [--amp]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from proxytransformation_tpu.utils.cache import enable_compilation_cache
from proxytransformation_tpu.utils.config import Config


def parse_args():
    parser = argparse.ArgumentParser(description='Train a grounder')
    parser.add_argument('config', help='config file path')
    parser.add_argument('--work-dir', help='dir to save logs and ckpts')
    parser.add_argument('--resume', nargs='?', const='auto', default=None,
                        help='resume from latest (auto) or a path')
    parser.add_argument('--amp', action='store_true',
                        help='bfloat16 compute path (reference tools/'
                             'train.py:94-105 AMP analog): sets model.'
                             'compute_dtype=bfloat16 and checkpoints '
                             'the painting gathers; geometry, norm '
                             'statistics and losses stay float32')
    parser.add_argument('--auto-scale-lr', action='store_true')
    parser.add_argument('--launcher', default='none',
                        help='kept for CLI parity; jax.distributed '
                             'initializes automatically on multi-host')
    parser.add_argument('--use_wandb', action='store_true')
    parser.add_argument('--cfg-options', nargs='+', default=[])
    return parser.parse_args()


def main():
    args = parse_args()
    enable_compilation_cache()

    import jax
    if args.launcher not in ('none', ''):
        try:
            jax.distributed.initialize()
        except Exception:
            pass

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(Config.parse_cfg_options(args.cfg_options))
    if args.amp:
        from proxytransformation_tpu.engine.runner import apply_amp
        apply_amp(cfg)
    if cfg.get('jax_platform'):
        # e.g. 'cpu' for CI smoke runs (the axon TPU plugin ignores the
        # JAX_PLATFORMS env var on this image)
        jax.config.update('jax_platforms', cfg['jax_platform'])
    work_dir = args.work_dir or cfg.get(
        'work_dir', os.path.join('work_dirs', os.path.splitext(
            os.path.basename(args.config))[0]))

    if args.use_wandb:
        # reference tools/train.py:138-149 forces a Wandb visualizer on
        # --use_wandb; here it degrades to the local backend offline
        vis = cfg.setdefault('visualizer', {})
        backends = vis.setdefault('vis_backends', [])
        if not backends:
            backends.append({'type': 'LocalVisBackend'})
        if not any(b.get('type') == 'WandbVisBackend' for b in backends):
            backends.append({'type': 'WandbVisBackend'})

    import proxytransformation_tpu.models  # noqa: F401  (register)
    import proxytransformation_tpu.data  # noqa: F401
    from proxytransformation_tpu.engine.runner import Runner

    runner = Runner.from_cfg(cfg, work_dir)
    runner.train(resume=args.resume)


if __name__ == '__main__':
    main()
