"""Test CLI (reference surface: tools/test.py) — runs the test split,
optionally dumping `test_results.json` (format_only evaluator)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from proxytransformation_tpu.utils.cache import enable_compilation_cache
from proxytransformation_tpu.utils.config import Config


def parse_args():
    parser = argparse.ArgumentParser(description='Test a grounder')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--work-dir')
    parser.add_argument('--show', action='store_true')
    parser.add_argument('--show-dir')
    parser.add_argument('--tta', action='store_true')
    parser.add_argument('--launcher', default='none')
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
    if 'test_dataloader' in cfg:
        cfg['val_dataloader'] = cfg['test_dataloader']
    if 'test_evaluator' in cfg:
        cfg['val_evaluator'] = cfg['test_evaluator']

    import proxytransformation_tpu.models  # noqa: F401
    import proxytransformation_tpu.data  # noqa: F401
    from proxytransformation_tpu.engine.runner import Runner

    runner = Runner.from_cfg(cfg, args.work_dir)
    runner.test(resume=args.checkpoint, tta=args.tta)


if __name__ == '__main__':
    main()
