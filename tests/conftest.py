import os

# Tests run on a virtual 8-device CPU mesh (SURVEY.md §4: multi-chip tests via
# host-platform device-count simulation).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
