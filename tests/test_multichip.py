"""Flagship multi-chip digest test (VERDICT r1 next-round #5): ResNet-50
sharded over the virtual dp x mp mesh must match single-device inference.
Runs the same path as __graft_entry__.dryrun_multichip's flagship stage,
at pytest scale (tiny spatial, small batch)."""

import numpy as np
import pytest


def test_resnet50_sharded_matches_single_device():
    import jax
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    import __graft_entry__ as ge
    from boda_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(n_devices=8, mp=2, devices=devs)
    mrd = ge.flagship_sharded_vs_single(mesh, devs[0], batch=8, ysz=32)
    assert mrd < 1e-4


def test_tiny_net_gpipe_and_train_step():
    """The full dryrun entry point (training step + gpipe) is runnable
    from pytest too — the driver isn't the only thing exercising it."""
    import jax
    if len(jax.devices("cpu")) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    import __graft_entry__ as ge
    ge._gpipe_smoke(jax.devices("cpu")[:4])
