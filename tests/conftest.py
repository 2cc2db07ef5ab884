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

import pytest  # noqa: E402

# Integration group (reference runtests.jl ARGS groups `core` vs
# `integration`, `test/runtests.jl:8-18`): heavy compile-everything and
# scale tests are opt-in via CADNIP_INTEGRATION=1 so the core suite
# stays in CLAUDE.md's "minutes" budget.
RUN_INTEGRATION = os.environ.get("CADNIP_INTEGRATION", "") == "1"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "integration: heavy compile/scale test (opt-in via "
        "CADNIP_INTEGRATION=1)")


def pytest_collection_modifyitems(config, items):
    if RUN_INTEGRATION:
        return
    skip = pytest.mark.skip(reason="integration group: set "
                            "CADNIP_INTEGRATION=1 to run")
    for item in items:
        if "integration" in item.keywords:
            item.add_marker(skip)
