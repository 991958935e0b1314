"""Evaluation CLI (reference surface: tools/eval.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from proxytransformation_tpu.utils.cache import enable_compilation_cache
from proxytransformation_tpu.utils.config import Config


def parse_args():
    parser = argparse.ArgumentParser(description='Evaluate a grounder')
    parser.add_argument('config')
    parser.add_argument('--work-dir')
    parser.add_argument('--resume', default=None,
                        help='checkpoint to load weights from')
    parser.add_argument('--launcher', default='none')
    parser.add_argument('--use_wandb', action='store_true')
    parser.add_argument('--cfg-options', nargs='+', default=[])
    return parser.parse_args()


def main():
    args = parse_args()
    enable_compilation_cache()
    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(Config.parse_cfg_options(args.cfg_options))
    if cfg.get('jax_platform'):
        import jax
        jax.config.update('jax_platforms', cfg['jax_platform'])

    if args.use_wandb:
        vis = cfg.setdefault('visualizer', {})
        backends = vis.setdefault('vis_backends', [])
        if not backends:
            backends.append({'type': 'LocalVisBackend'})
        if not any(b.get('type') == 'WandbVisBackend' for b in backends):
            backends.append({'type': 'WandbVisBackend'})

    import proxytransformation_tpu.models  # noqa: F401
    import proxytransformation_tpu.data  # noqa: F401
    from proxytransformation_tpu.engine.runner import Runner

    runner = Runner.from_cfg(cfg, args.work_dir)
    runner.val(resume=args.resume)


if __name__ == '__main__':
    main()
