"""Force the CPU backend with 8 virtual devices for all tests.

The environment pins JAX_PLATFORMS=axon (real TPU tunnel) via sitecustomize;
tests must run on the host CPU with a virtual multi-device mesh.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
