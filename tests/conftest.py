"""Test environment: force an 8-device virtual CPU platform before jax use.

Tests validate numerics and multi-chip sharding on CPU (the driver dry-runs
the multi-chip path the same way); real-TPU execution is covered by bench.py.

Note: this machine pins ``JAX_PLATFORMS=axon`` (the TPU tunnel) in the
environment and something in the stack resets ``jax_platforms`` to
``axon,cpu`` on import, so a plain env-var override is not enough — we also
update the jax config programmatically.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
