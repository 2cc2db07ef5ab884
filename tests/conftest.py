"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests run without TPU hardware, with native f64.

Note: the environment's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (remote TPU), so env vars are too late — we switch the
platform through jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
