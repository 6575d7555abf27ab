"""Test configuration: 8 virtual CPU devices + float64.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding paths are
validated without TPU hardware) and in float64 so physics invariants can be
checked at reference tolerances (the reference engine is Float64 CPU).
TPU production runs use float32 — covered by dtype-parametrized smoke tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_enable_x64", True)
