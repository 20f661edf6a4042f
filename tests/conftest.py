"""Test environment: force CPU with 8 virtual devices.

Multi-chip sharding is validated on a simulated 8-device CPU mesh (there is
no multi-chip TPU hardware in CI); Pallas kernels run in interpreter mode on
CPU automatically (see ops/naive_pallas.py).

NOTE: the ambient environment registers the experimental "axon" TPU plugin
and setting the JAX_PLATFORMS env var from inside Python does NOT stop it —
only ``jax.config.update("jax_platforms", ...)`` before first device use
reliably forces CPU. XLA_FLAGS must still be set pre-import for the
virtual device count.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
