import os

# Tests run on a virtual 8-device CPU mesh (SURVEY.md §4: multi-chip tests via
# host-platform device-count simulation).  The container's sitecustomize pins
# JAX_PLATFORMS=axon (the tunneled TPU), so setting the env var is not enough:
# override via jax.config before the backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
