"""ProxyTransformation-TPU: a TPU-native ego-centric 3D visual grounding framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
ProxyTransformation (CVPR 2025) / EmbodiedScan (reference:
/root/reference, pqh22/ProxyTransformation). The compute path is pure
JAX with Pallas TPU kernels for the hot ops; all data paths use static
shapes with validity masks (no ragged tensors), so every model jits and
shards over a `jax.sharding.Mesh`.
"""

__version__ = '0.1.0'
