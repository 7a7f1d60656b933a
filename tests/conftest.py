"""Test configuration: force an 8-device virtual CPU topology.

The multi-device tests emulate a v5e-8 mesh on the host platform
(SURVEY.md §4: the TPU-native analog of testing multi-node without a cluster).

The session's sitecustomize registers the real-TPU backend at interpreter start
and pins jax_platforms, so a plain JAX_PLATFORMS env var is not enough — we
override via jax.config before any backend is used. Set HICDIFF_TEST_TPU=1 to opt
back into the real chip.
"""
import os
import sys

# repo root on sys.path so `import hicdiff_tpu` works without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("HICDIFF_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
