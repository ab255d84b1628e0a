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
