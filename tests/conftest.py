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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_compile_cache():
    """Drop JAX's executable caches between test modules.

    XLA:CPU's in-process compiler state grows over the suite's hundreds
    of distinct programs and has segfaulted (inside
    ``backend_compile_and_load``, reproducibly ~57 tests into
    test_temporal.py but only when the full suite ran first — the same
    compile passes in a fresh process). Clearing between modules keeps
    the compiler's working set bounded; per-module recompiles are cheap
    on CPU."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (subprocess fan-out etc.)")
