"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver separately dry-runs the multichip path).

NOTE: this host's sitecustomize imports jax and pins JAX_PLATFORMS=axon at
interpreter start, so environment variables are too late — only
jax.config.update works, and it must run before the first backend use.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", "tests must run on CPU"
