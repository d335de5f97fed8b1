"""Test configuration: CPU backend with 8 virtual devices (for sharding
tests) and float64 (the reference accuracy thresholds need it, BASELINE.md).

Mirrors the reference CI strategy (single-process pytest,
.github/workflows/tests.yml) plus the SURVEY.md §4 recommendation to test
sharding via xla_force_host_platform_device_count.

NOTE: the image presets JAX_PLATFORMS=axon (TPU tunnel) and the axon plugin
ignores the env var, so the platform must be forced via jax.config BEFORE
any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
