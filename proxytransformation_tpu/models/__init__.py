from . import preshape  # noqa: F401
from . import resnet  # noqa: F401
from . import text_encoder  # noqa: F401
from . import sparse_resnet  # noqa: F401
from . import sparse_neck  # noqa: F401
from . import decoder  # noqa: F401
from . import grounding_head  # noqa: F401
from . import detector  # noqa: F401

from .detector import SparseFeatureFusion3DGrounderPreshape  # noqa: F401

__all__ = ['SparseFeatureFusion3DGrounderPreshape']
