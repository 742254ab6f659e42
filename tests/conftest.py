import os
import sys

# TPU-free test environment: 8 virtual CPU devices for sharding tests.
# XLA_FLAGS is read at backend init; jax may already be imported by the
# environment's sitecustomize, so the platform must be forced via config.
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
