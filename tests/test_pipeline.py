"""Pipeline-parallel tests (GPipe microbatch schedule over the virtual
8-device CPU mesh; SURVEY §2.8 optional-PP layer)."""

import numpy as np
import pytest

from boda_tpu.parallel.mesh import make_mesh
from boda_tpu.parallel.pipeline import gpipe_forward, stack_stage_params


def _mlp_stage(params, x):
    import jax.numpy as jnp
    return jnp.tanh(x @ params["w"] + params["b"])


def _make_stages(k, d, seed=0):
    rng = np.random.RandomState(seed)
    return [{"w": (rng.randn(d, d) * 0.3).astype(np.float32),
             "b": np.zeros(d, np.float32)} for _ in range(k)]


@pytest.mark.parametrize("pp,m", [(4, 8), (2, 3), (8, 1)])
def test_gpipe_matches_sequential(pp, m):
    import jax
    from jax.sharding import Mesh
    d = 16
    mb = 4
    devices = np.array(jax.devices("cpu")[:pp])
    mesh = Mesh(devices, ("pp",))
    stages = _make_stages(pp, d)
    stacked = stack_stage_params(stages)
    rng = np.random.RandomState(1)
    x = rng.randn(m, mb, d).astype(np.float32)
    got = np.asarray(gpipe_forward(_mlp_stage, stacked, x, mesh))
    # sequential reference
    want = x.copy()
    for s in stages:
        want = np.tanh(want @ s["w"] + s["b"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gpipe_on_2d_mesh_axis():
    """pp can be one axis of a larger mesh (dp x pp)."""
    import jax
    from jax.sharding import Mesh
    devices = np.array(jax.devices("cpu")[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dp", "pp"))
    d = 8
    stages = _make_stages(4, d, seed=3)
    stacked = stack_stage_params(stages)
    x = np.random.RandomState(2).randn(5, 2, d).astype(np.float32)
    got = np.asarray(gpipe_forward(_mlp_stage, stacked, x, mesh, axis="pp"))
    want = x.copy()
    for s in stages:
        want = np.tanh(want @ s["w"] + s["b"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
