from .registry import Registry, MODELS, TASK_UTILS, DATASETS, TRANSFORMS, METRICS, LOOPS
from .config import Config

__all__ = [
    'Registry', 'MODELS', 'TASK_UTILS', 'DATASETS', 'TRANSFORMS', 'METRICS',
    'LOOPS', 'Config'
]
