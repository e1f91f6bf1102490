"""Test env: force an 8-device virtual CPU mesh BEFORE jax import.

The image pins JAX_PLATFORMS=axon (TPU plugin); tests run on CPU with 8
virtual devices so sharding tests work without a pod (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The image's sitecustomize imports jax (axon TPU plugin) at interpreter
# startup — before this conftest — so env vars alone are too late. The
# backend itself is only initialized at first use, so reconfigure here.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _no_stale_active_mesh():
    """The active-mesh registry (kd_cheap_conv_tpu.config.set_active_mesh)
    is process-global trace-time state; a test that forgets to clear it
    makes LATER tests' model calls take the shard_map path with whatever
    batch they use (found: in-process cli.main() leaked its mesh and a
    batch-2 module test 10 files later hit the divisibility error)."""
    yield
    from kd_cheap_conv_tpu import config

    config.set_active_mesh(None)
