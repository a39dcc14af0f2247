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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The full suite compiles hundreds of CPU programs in one process;
    with every executable kept alive, the XLA CPU compiler started
    segfaulting deterministically on the LAST big compile of the run
    (tests/test_sparse_align.py robust-align program — reproduced twice
    at the same position, while either half of the suite alone passes).
    Per-module cache clearing bounds live-executable accumulation;
    cross-module jit reuse is minimal so the recompile cost is noise.
    """
    yield
    jax.clear_caches()
