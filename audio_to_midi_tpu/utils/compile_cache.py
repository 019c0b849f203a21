"""Persistent XLA/Mosaic compilation cache for tools and benchmarks.

On tunneled-TPU setups compiles run remotely and a cold compile of the full
training step or the fused kernels costs minutes; the persistent cache makes
every repeat invocation of a tool start in seconds.  Library code never sets
this implicitly — entry points opt in.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "/tmp/a2m_jax_cache"


def enable_default_cache(cache_dir: str | None = None) -> str:
    """Enable jax's persistent compilation cache (idempotent).

    Precedence: explicit arg > $JAX_COMPILATION_CACHE_DIR > DEFAULT_CACHE_DIR.
    """
    import jax

    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything, including fast compiles — the relay round trip, not
    # local compile time, is what the cache saves here.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return path
