"""Test configuration: force an 8-device virtual CPU platform.

This is the reference's own multi-device-without-a-cluster idiom
(train.py:905, commented) promoted to a first-class test fixture: all sharding
tests run against 8 virtual CPU devices so collectives and shardings are
exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the env may point at TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's site hook may have imported jax already (TPU tunnel
# platform); force the virtual-CPU platform at the config level too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
