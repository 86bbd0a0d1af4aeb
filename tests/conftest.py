"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell exports JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not honored once the axon TPU plugin is installed;
# the config update is.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
