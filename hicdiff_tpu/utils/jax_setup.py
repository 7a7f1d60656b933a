"""Process-level JAX configuration for the CLIs.

Remote-compile TPU backends take minutes to compile the 32-block backbone; the
persistent compilation cache cuts repeat CLI invocations (train -> inference ->
bench on the same shapes) by ~6x. Cache location: $HICDIFF_JAX_CACHE or
~/.cache/hicdiff_tpu/jax.
"""
from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("HICDIFF_JAX_CACHE")
        or os.path.expanduser("~/.cache/hicdiff_tpu/jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
