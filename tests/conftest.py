"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh so that the multi-chip
sharding paths compile and execute without TPU hardware.  Must be set
before JAX initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
