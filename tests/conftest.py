"""Test environment: force an 8-device virtual CPU platform before jax loads.

Tests validate numerics and multi-chip sharding on CPU (the driver dry-runs
the multi-chip path the same way); real-TPU execution is covered by bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
