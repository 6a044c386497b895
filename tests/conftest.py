"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This emulates a TPU v5e-8 slice for sharding tests without TPU hardware, per
the test strategy in SURVEY.md §4. The axon TPU plugin ignores the
JAX_PLATFORMS environment variable, so the platform is forced via jax.config
before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
