"""Force an 8-virtual-device CPU backend for the whole test session.

Note: on this image the axon TPU plugin ignores the JAX_PLATFORMS env
var, so we must use the jax.config API (before any backend is created).
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    flags += ' --xla_force_host_platform_device_count=8'
if 'collective_call_terminate_timeout' not in flags:
    # default 40 s rendezvous TERMINATE aborts the process when 8
    # device threads timeshare this 1-core image (see __graft_entry__)
    flags += (' --xla_cpu_collective_call_warn_stuck_timeout_seconds=120'
              ' --xla_cpu_collective_call_terminate_timeout_seconds=600')
os.environ['XLA_FLAGS'] = flags.strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)

# Persistent CPU compile cache: opt-in only (PT_CPU_COMPILE_CACHE=1).
# It cut warm gate reruns from ~40 min to minutes, but CPU-executable
# deserialization intermittently SEGFAULTS in long-lived processes on
# this image (see utils/cache.py::enable_cpu_compilation_cache).
from proxytransformation_tpu.utils.cache import (  # noqa: E402
    enable_cpu_compilation_cache)

enable_cpu_compilation_cache(prefix='pt_test_xla')
