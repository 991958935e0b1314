from . import transforms  # noqa: F401  (registers transforms)
from . import dataset  # noqa: F401
from . import preprocessor  # noqa: F401
from . import synthetic  # noqa: F401

from .dataset import (MultiView3DGroundingDataset, EmbodiedScanDataset,
                      RepeatDataset)
from .preprocessor import Det3DDataPreprocessor
from .loader import DataLoader
from .synthetic import SyntheticGroundingDataset

__all__ = [
    'MultiView3DGroundingDataset', 'EmbodiedScanDataset', 'RepeatDataset',
    'Det3DDataPreprocessor', 'DataLoader', 'SyntheticGroundingDataset'
]
