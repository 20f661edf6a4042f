"""Test environment: force CPU with 8 virtual devices.

Multi-chip sharding is validated on a simulated 8-device CPU mesh (there is
no multi-chip TPU hardware in CI); Pallas kernels run in interpreter mode on
CPU automatically (see ops/naive_pallas.py). Must run before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_prng_impl", "threefry2x32")
