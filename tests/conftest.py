"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; all sharding tests run on
XLA's host-platform device emulation.  Must run before jax is imported.
"""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (the dev environment sets
# JAX_PLATFORMS=axon, a tunneled single TPU, and pre-imports jax from
# sitecustomize — so env vars are too late; use jax.config).  Opt back
# into real hardware with CLS_TEST_PLATFORM=axon.
os.environ["JAX_PLATFORMS"] = os.environ.get("CLS_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402
import jax  # noqa: E402


def pytest_configure(config):
    # Fast/slow split: the full suite stays the default gate; deselect
    # with -m "not slow" for a <10-min bit-exactness core (the slow set
    # is release-shape CPU work + the 2-process DCN launch).
    config.addinivalue_line(
        "markers",
        "slow: release-shape / multiprocess tests (deselect with "
        "-m 'not slow' for the fast bit-exactness gate)",
    )

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_num_cpu_devices", 8)

# Eager op dispatch is extremely slow in this environment (~0.4s/op first
# compile); tests jit everything and share a persistent compilation cache.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from c_lwe_snarks_tpu.utils import params as params_mod  # noqa: E402


@pytest.fixture(scope="session")
def tiny():
    """Very small instance for fast conformance tests."""
    return params_mod.custom(d=64, m=16)


@pytest.fixture(scope="session")
def toy():
    """The reference's debug macro set (src/lwe.h:18-21)."""
    return params_mod.toy()
