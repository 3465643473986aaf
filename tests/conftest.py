import os

# Force tests onto a virtual 8-device CPU mesh so sharding paths are
# exercised without TPU hardware.  The session environment presets
# JAX_PLATFORMS=axon (tunneled TPU) and a sitecustomize imports jax at
# interpreter startup, so the env var is already frozen into jax.config
# by the time this conftest runs — update the config directly as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
