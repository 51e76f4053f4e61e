"""Persistent XLA compilation cache, on by default for every entry point.

The distillation chunks are large scanned programs (teacher forward + student
fwd/bwd + Adam, unrolled over a lookahead window); on a small host their XLA
compiles dominate tool start-up — minutes per configuration.  The reference
pays an analogous cost nowhere because torch eager has no compile step; our
equivalent of its "start instantly, run slower" property is compile-once:
every process that builds the same program afterwards loads it from an
on-disk cache in milliseconds.

Enabled from ``tha4_tpu/__init__.py`` at import time (opt out with
``THA4_COMPILE_CACHE=0``; redirect with ``THA4_COMPILE_CACHE_DIR=...``).
Safe under concurrent processes — JAX writes cache entries atomically — and
keyed on backend + program, so the CPU-mesh test suite and the real-chip
tools share the directory without collisions.
"""

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "tha4_tpu", "xla")

_enabled = False


def enable_persistent_cache() -> bool:
    """Idempotently turn on the JAX persistent compilation cache.

    Returns True if the cache is (now) enabled.  Never raises: on JAX
    versions without the config knobs, or an unwritable cache dir, we run
    uncached exactly as before.
    """
    global _enabled
    if _enabled:
        return True
    if os.environ.get("THA4_COMPILE_CACHE", "1") == "0":
        return False
    cache_dir = os.environ.get("THA4_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # The default 1 s floor skips exactly the small programs whose
        # compiles are cheap anyway; keep it, but cache regardless of size.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        # Keep state and return value consistent: if the second update
        # raised after the first succeeded, undo the cache-dir setting.
        try:
            import jax
            jax.config.update("jax_compilation_cache_dir", None)
        except Exception:
            pass
        return False
    _enabled = True
    return True
