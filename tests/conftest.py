"""Test configuration: force a virtual 8-device CPU mesh so sharding tests run
without TPU hardware.

The environment presets JAX_PLATFORMS=axon and a sitecustomize module that
imports jax and registers the remote-TPU plugin at interpreter start — before
this conftest runs — so setting os.environ here is not always enough: when
jax is already imported its config defaults were materialised from the old
env, and must be updated through jax.config as well (the backend itself is
not yet initialised at collection time, so the updates still take effect).
"""

import os
import sys

# Force CPU: the unit/sharding suite must never contend for the (single,
# exclusive) TPU chip; benchmarks own the TPU instead.
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # defuse the tunnel for subprocesses
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if "jax" in sys.modules:
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # backend already initialised; the env vars did their job
