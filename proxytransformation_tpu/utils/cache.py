"""Persistent XLA compilation cache (first TPU compile through the
tunnel is slow; cache hits make reruns near-instant)."""
import os


def enable_compilation_cache(path: str = '/root/.cache/jax_comp_cache'):
    import jax
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
