"""Test configuration: run everything on an 8-device virtual CPU mesh.

The container's sitecustomize imports jax and pins JAX_PLATFORMS=axon
(single real TPU behind a tunnel) at interpreter startup, so plain env
vars set here are too late — use jax.config.update instead, before any
backend is initialized.  Tests must be hermetic and parallel-safe, so
they run on a virtual 8-device CPU mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; got %s" % jax.devices())


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running protocol test (several minutes)")
