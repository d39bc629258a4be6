"""Test configuration: run the suite on a virtual 8-device CPU mesh so all
multi-chip sharding paths are exercised without TPU hardware.

The container's sitecustomize registers the `axon` TPU backend at interpreter
start, so jax is already imported here; switching `jax_platforms` before the
first backend use routes everything to CPU (backends initialize lazily).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
