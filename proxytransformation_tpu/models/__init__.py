from . import preshape  # noqa: F401  (registers ProxyTransformationNormReverse)

__all__ = ['preshape']
