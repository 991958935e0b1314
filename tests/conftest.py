"""Test config: force an 8-virtual-device CPU platform so multi-chip
sharding paths run in CI without TPUs.

Note: on this image the axon TPU plugin ignores the JAX_PLATFORMS env
var, so we must use the jax.config API (before any backend is created).
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)
