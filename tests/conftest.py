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
# Force (not setdefault): the driver env sets JAX_PLATFORMS=axon (the
# tunnel plugin), which the xla Backend honors — tests must not run
# over the serialized TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

import pytest  # noqa: E402


@pytest.fixture()
def tmp_out(tmp_path):
    return tmp_path


# build the native core library if missing (keeps the cpp differential
# tests active on fresh checkouts; ~3s, skipped when make/g++ absent)
def _ensure_native_lib():
    import shutil
    import subprocess
    from pathlib import Path
    root = Path(__file__).resolve().parents[1]
    lib = root / "build" / "libboda_tpu_core.so"
    if lib.exists() or shutil.which("make") is None:
        return
    try:
        subprocess.run(["make", "-C", str(root / "csrc")], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        pass  # tests skip gracefully without the lib


_ensure_native_lib()


# ---- slow-test gating (VERDICT r3 #8) ----
# `pytest -q` is the tight default loop; tests marked slow run only with
# BODA_RUN_SLOW=1 (CI / pre-ship). Golden-cmd coverage of slow=1 entries
# is kept by `python -m boda_tpu test_all` (run_slow defaults on there).
def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy test; skipped unless BODA_RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("BODA_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow (set BODA_RUN_SLOW=1)")
    for it in items:
        if "slow" in it.keywords:
            it.add_marker(skip)
