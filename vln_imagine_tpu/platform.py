"""Backend/platform environment shared by every CLI entry point.

Lives in the package (not scripts/) so `python -m`, embedding, and the
pretrain CLI all resolve it without relying on scripts/ being sys.path[0]
or colliding with an installed package named 'train'.
"""

from __future__ import annotations

import os


def apply_platform_env():
    """VLN_PLATFORM=cpu forces the backend through jax.config (the axon
    site config overrides the JAX_PLATFORMS env var, so the env-var route
    does not work here) and enables the persistent compile cache.  Must run
    before any backend init — lets the CLIs operate with the TPU tunnel
    down and makes them drivable from subprocess tests."""
    import jax

    plat = os.environ.get("VLN_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("VLN_JAX_CACHE", "/tmp/vln_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
