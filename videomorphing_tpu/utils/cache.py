"""Persistent XLA compilation cache.

The solver compiles one specialization per pyramid-level shape, and TPU
compiles cost 20-40 s each — a cold 1080p video run spends minutes in the
compiler. Enabling JAX's persistent compilation cache makes every
subsequent process reuse them (the cache lives inside the repo workspace
so benchmark runs after a warmup run are compile-free).
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (idempotent)."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "VMORPH_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache", "jax"),
        )
    if cache_dir in ("off", "0", "disabled", ""):
        # Escape hatch: the persistent cache's executable (de)serialization
        # has segfaulted inside jaxlib on large CPU shard_map executables
        # (observed twice in the test suite, once on get and once on put,
        # with a fresh cache dir both times). Tests disable it entirely.
        return ""
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
