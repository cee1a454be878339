"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh so the multi-chip sharding
paths compile and execute without TPU hardware.  The environment's
sitecustomize may import jax (and snapshot JAX_PLATFORMS) before this file
runs, so the platform override must go through jax.config, not os.environ.
"""

import os

if os.environ.get("VVC_TPU_TESTS") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
