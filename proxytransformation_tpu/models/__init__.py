from . import preshape  # noqa: F401
from . import resnet  # noqa: F401
from . import text_encoder  # noqa: F401
from . import sparse_resnet  # noqa: F401
from . import sparse_neck  # noqa: F401
from . import decoder  # noqa: F401
from . import grounding_head  # noqa: F401
from . import detector  # noqa: F401
from . import fcaf3d_head  # noqa: F401
from . import embodied_det3d  # noqa: F401
from . import occ  # noqa: F401
from . import misc  # noqa: F401
from . import tta  # noqa: F401

from .detector import (SparseFeatureFusion3DGrounderPreshape,
                       SparseFeatureFusion3DGrounder)
from .embodied_det3d import Embodied3DDetector
from .occ import EmbodiedOccPredictor, DenseFusionOccPredictor

__all__ = [
    'SparseFeatureFusion3DGrounderPreshape', 'SparseFeatureFusion3DGrounder',
    'Embodied3DDetector', 'EmbodiedOccPredictor', 'DenseFusionOccPredictor'
]
