"""Persistent XLA compilation cache (first TPU compile through the
tunnel is slow; cache hits make reruns near-instant)."""
import hashlib
import os
import platform


def enable_compilation_cache(path: str = '/root/.cache/jax_comp_cache'):
    import jax
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


def machine_keyed_cache_dir(prefix: str = 'pt_xla_cpu') -> str:
    """Cache dir keyed by machine + jax version.

    CPU AOT blobs embed the compiling machine's CPU features; replaying
    them on a different CPU can SIGILL. Keying the directory by a hash
    of /proc/cpuinfo flags (+arch +jax version) makes a moved disk
    image start a fresh cache instead of replaying foreign blobs.
    """
    import jax
    try:
        with open('/proc/cpuinfo') as f:
            flags_line = next((ln for ln in f if ln.startswith('flags')), '')
        tag = hashlib.sha1(flags_line.encode()).hexdigest()[:8]
    except OSError:
        tag = 'nocpuinfo'
    # v2: caches written before the callback-serialization guard may
    # hold entries that SEGFAULT on deserialize — never reuse them
    return os.path.expanduser(
        f'~/.cache/{prefix}_v2_{platform.machine()}_{tag}_'
        f'{jax.__version__}')


def _guard_callback_serialization():
    """Skip cache writes for executables embedding python callbacks.

    Interpret-mode Pallas kernels lower to python-callback custom calls
    that are NOT registered in jax's `host_callbacks` list, so the
    built-in _cache_write guard misses them and
    `executable.serialize()` SEGFAULTS the process (observed on the
    sparse-model tests under the CPU cache). Idempotent monkeypatch.
    """
    from jax._src import compilation_cache as cc
    if getattr(cc.put_executable_and_time, '_pt_callback_guard', False):
        return
    orig = cc.put_executable_and_time

    def safe_put(cache_key, module_name, executable, backend,
                 compile_time):
        try:
            hlo = '\n'.join(m.to_string()
                            for m in executable.hlo_modules())
            if 'callback' in hlo and 'custom-call' in hlo:
                return
        except Exception:
            return  # cannot prove it is safe to serialize -> skip
        return orig(cache_key, module_name, executable, backend,
                    compile_time)

    safe_put._pt_callback_guard = True
    cc.put_executable_and_time = safe_put


def enable_cpu_compilation_cache(prefix: str = 'pt_xla_cpu',
                                 force: bool = False):
    """Machine-keyed persistent cache for CPU-backend runs.

    DISABLED by default (set PT_CPU_COMPILE_CACHE=1 to opt in): on this
    image, deserializing CPU executables from the cache intermittently
    SEGFAULTS in long-lived processes — the same entry reads fine in a
    fresh process, but the full test gate crashed three times inside
    compilation_cache get/put (with and without the callback guard, on
    a fresh cache, with no background threads). A slow green gate beats
    a fast crashing one; revisit if jaxlib's CPU executable
    serialization stabilizes.

    force=True opts in programmatically — ONLY safe for short-lived
    fresh processes (e.g. the multichip dryrun), where cache reads have
    always been clean; it also REPLACES any previously configured cache
    dir, which matters because the generic TPU cache
    (`enable_compilation_cache`) may hold CPU AOT blobs compiled on a
    DIFFERENT machine (observed: the driver host has AMX, this one
    doesn't — xla cpu_aot_loader warns SIGILL on such loads). The
    machine-keyed dir never replays foreign blobs."""
    import jax
    if not (force or os.environ.get('PT_CPU_COMPILE_CACHE')):
        try:  # never leave a foreign-machine cache dir active for CPU
            jax.config.update('jax_compilation_cache_dir', None)
        except Exception:
            pass
        return
    path = machine_keyed_cache_dir(prefix)
    try:
        _guard_callback_serialization()
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    except Exception:
        pass
