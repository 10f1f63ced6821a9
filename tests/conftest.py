"""Test config: force all tests onto a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding/pjit paths are
validated on XLA's host platform with 8 virtual devices. NOTE: under the
axon TPU tunnel, JAX_PLATFORMS=cpu alone does NOT stop the plugin from
becoming the default backend — jax_platform_name must be set after import
(verified: default_backend() stays 'tpu' otherwise, silently running
"CPU" tests over the tunnel).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

import pytest  # noqa: E402


@pytest.fixture()
def tmp_out(tmp_path):
    return tmp_path
