"""Pytest root conftest: force an 8-device virtual CPU mesh for all tests.

Tests validate multi-chip sharding logic without TPU hardware, per the
standard JAX pattern (xla_force_host_platform_device_count).

Note: this environment's sitecustomize imports jax at interpreter startup and
registers the 'axon' TPU backend, so setting JAX_PLATFORMS here is too late —
we must also update jax.config before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"
