"""Test config: force an 8-device virtual CPU platform.

This is the TPU-native answer to multi-node testing without a cluster
(SURVEY.md §4): all sharding/collective tests run against a real 8-device
jax Mesh backed by host CPU devices.

NOTE: this environment's sitecustomize imports jax at interpreter startup and
registers a remote-TPU ("axon") backend, so env vars alone are too late —
we must flip the platform through jax.config before any backend initialises.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
