"""Test env: force CPU with 8 fake devices BEFORE jax import, so
shard_map/mesh tests run without a TPU (SURVEY.md §4 'Distributed')."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the tunneled-TPU backend at interpreter
# startup and pins jax_platforms; override AFTER import so tests run on the
# fake 8-device CPU mesh (fast, deterministic, no tunnel latency).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
