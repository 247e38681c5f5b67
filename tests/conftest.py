"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver separately dry-runs the multichip path).

Must run before jax is imported anywhere in the test process.
"""

import os

# force-override: the machine env pins JAX_PLATFORMS=axon (the TPU tunnel)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
