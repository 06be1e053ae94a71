"""Test configuration: force an 8-device CPU platform for sharding tests.

The container registers a single-chip TPU backend ('axon') at interpreter
start via sitecustomize. For unit tests we want a deterministic 8-device
CPU mesh (the standard JAX fake-cluster technique), so we flip the platform
before any backend is initialized.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
