"""Process-level JAX configuration for the CLIs.

Remote-compile TPU backends take minutes to compile the 32-block backbone; the
persistent compilation cache cuts repeat CLI invocations (train -> inference ->
bench on the same shapes) by ~6x. Cache location: $HICDIFF_JAX_CACHE or
~/.cache/hicdiff_tpu/jax.

HICDIFF_PLATFORM pins the JAX platform for every CLI (e.g. =cpu to run the
whole framework without an accelerator, or when the remote TPU tunnel is
down). The env var JAX_PLATFORMS alone is not enough on images whose
sitecustomize auto-registers a remote backend; the pin must be applied via
jax.config before the first backend touch, which is why it lives here — every
CLI calls enable_compilation_cache() before any jax compute.
"""
from __future__ import annotations

import os

__all__ = ["configure_platform", "enable_compilation_cache"]


def configure_platform() -> str | None:
    """Apply the HICDIFF_PLATFORM pin (no-op when unset).

    Must run before the process's first JAX backend use; a later call raises
    no error but silently cannot change an already-initialized backend, so we
    surface that case loudly.
    """
    platform = os.environ.get("HICDIFF_PLATFORM")
    if not platform:
        return None
    import jax

    try:
        jax.config.update("jax_platforms", platform)
    except RuntimeError as e:  # backend already initialized
        raise RuntimeError(
            f"HICDIFF_PLATFORM={platform} set but the JAX backend is already "
            "initialized; call enable_compilation_cache()/configure_platform() "
            "before any jax compute"
        ) from e
    return platform


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    configure_platform()
    cache_dir = (
        cache_dir
        or os.environ.get("HICDIFF_JAX_CACHE")
        or os.path.expanduser("~/.cache/hicdiff_tpu/jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
