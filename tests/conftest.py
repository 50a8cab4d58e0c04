"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; all sharding tests run on
XLA's host-platform device emulation.  Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

from c_lwe_snarks_tpu.utils import params as params_mod  # noqa: E402


@pytest.fixture(scope="session")
def tiny():
    """Very small instance for fast conformance tests."""
    return params_mod.custom(d=64, m=16)


@pytest.fixture(scope="session")
def toy():
    """The reference's debug macro set (src/lwe.h:18-21)."""
    return params_mod.toy()
