"""Test config: run all tests on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding/pjit paths are
validated on XLA's host platform with 8 virtual devices (the same trick the
driver's dryrun_multichip uses). Must set env before jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture()
def tmp_out(tmp_path):
    return tmp_path
