"""Test configuration: run everything on CPU with 8 virtual devices so the
mesh/shard_map paths are exercised without TPU hardware (SURVEY.md §4.3),
and enable x64 so float64 golden-model comparisons are meaningful."""

import os

# the environment pins JAX_PLATFORMS to the TPU plugin; tests must run on
# the virtual CPU mesh, so override both the env var and the live config
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (subprocess fan-out etc.)")
