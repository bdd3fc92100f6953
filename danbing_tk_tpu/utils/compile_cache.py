"""Persistent XLA compilation cache (VERDICT r1 weak #3).

Production-size align programs compile in minutes (P=4096 took 280s on
the bench chip; the 115M-key scale step ~170s); without a persistent
cache that cost recurs every process launch.  Enabling JAX's disk cache
makes relaunch/resume (and the driver's repeated bench runs) pay it
once per (program, shape, backend).

Called by the align CLI on --device and by the bench tools.  The cache
location defaults to <repo>/build/jaxcache and can be overridden with
DTK_COMPILE_CACHE (set to "0" to disable).
"""

from __future__ import annotations

import os

_enabled = False


def enable_compile_cache(path: str | None = None) -> str | None:
    """Idempotently point jax at a persistent on-disk compile cache;
    returns the cache dir (None if disabled via DTK_COMPILE_CACHE=0)."""
    global _enabled
    env = os.environ.get("DTK_COMPILE_CACHE")
    if env == "0":
        return None
    if path is None:
        path = env or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "build", "jaxcache")
    if _enabled:
        return path
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
    return path
