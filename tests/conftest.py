import os

# Run the whole suite on a virtual 8-device CPU mesh: multi-chip sharding is
# validated without TPU hardware, and tests stay deterministic/fast.
# NOTE: this machine's axon site config overrides the JAX_PLATFORMS env var,
# so we must force the platform through jax.config before backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: repeated suite runs (and repeated tests that
# trace the same shapes) skip recompiles.  Same trick bench.py uses.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("VLN_JAX_CACHE", "/tmp/vln_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
