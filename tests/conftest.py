"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths can be
validated without TPU hardware; float64 is enabled to match the reference's
double-precision physics.

Note: the axon TPU plugin force-sets ``jax_platforms="axon,cpu"`` at
registration time, so the ``JAX_PLATFORMS`` environment variable alone is not
enough -- we override the config *after* importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
