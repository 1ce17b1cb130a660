"""Test configuration: run all tests on CPU with 8 virtual devices.

Multi-device sharding tests use a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), per the reference test strategy replacement
plan (SURVEY.md §4): unit tests + golden numerics + multi-device-on-CPU.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not honored when an out-of-tree TPU plugin (axon) is
# installed — it still becomes the default backend and every eager op pays a
# tunnel round-trip. The config update does force CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
