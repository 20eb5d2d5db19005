"""Test env: force CPU with 8 virtual devices (multi-chip sharding tests).

The container's sitecustomize registers the TPU PJRT plugin at interpreter
start (PALLAS_AXON_POOL_IPS), so plain env vars in conftest are too late —
``jax.config.update`` is the reliable override.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend()
)
assert jax.device_count() == 8, "expected 8 virtual CPU devices"
