"""Test configuration: force a virtual 8-device CPU mesh so sharding tests run
without TPU hardware. Must run before jax is imported anywhere."""

import os

# Force CPU: the unit/sharding suite must never contend for the (single,
# exclusive) TPU chip; benchmarks own the TPU instead.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
