"""Test config: force an 8-device virtual CPU platform BEFORE jax initialises.

This is the TPU-native answer to multi-node testing without a cluster
(SURVEY.md §4): all sharding/collective tests run against a real 8-device
jax Mesh backed by host CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the axon TPU plugin ignores JAX_PLATFORMS; the legacy var works
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism + speed for tests
os.environ.setdefault("JAX_ENABLE_X64", "0")
