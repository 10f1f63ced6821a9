"""Fused bottleneck-block kernel tests (resblock): interpret-mode kernel
body + fallback path vs the independent conv reference composition."""

import numpy as np
import pytest

from boda_tpu.core.dims import Dims
from boda_tpu.ops.op_base import OpBase
from boda_tpu.ops.registry import get_template


def _make_op(n, C, H, W, Cm, prec="", relu_out=True):
    op = OpBase({"type": "resblock", "func_name": "resblock"})
    op.set_dims("in", Dims.make(img=n, chan=C, y=H, x=W))
    op.set_dims("w1", Dims.make(out_chan=Cm, in_chan=C, y=1, x=1))
    op.set_dims("b1", Dims.make(out_chan=Cm))
    op.set_dims("w2", Dims.make(out_chan=Cm, in_chan=Cm, y=3, x=3))
    op.set_dims("b2", Dims.make(out_chan=Cm))
    op.set_dims("w3", Dims.make(out_chan=C, in_chan=Cm, y=1, x=1))
    op.set_dims("b3", Dims.make(out_chan=C))
    op.set_dims("out", Dims.make(img=n, chan=C, y=H, x=W))
    op.set_u32("relu_out", int(relu_out))
    if prec:
        op.str_vals["prec"] = prec
    return op


def _args(n, C, H, W, Cm, seed=0):
    rng = np.random.RandomState(seed)
    s = 0.2
    return [rng.randn(n, C, H, W).astype(np.float32) * s,
            rng.randn(Cm, C, 1, 1).astype(np.float32) * s,
            rng.randn(Cm).astype(np.float32) * s,
            rng.randn(Cm, Cm, 3, 3).astype(np.float32) * s / 3,
            rng.randn(Cm).astype(np.float32) * s,
            rng.randn(C, Cm, 1, 1).astype(np.float32) * s,
            rng.randn(C).astype(np.float32) * s]


@pytest.mark.parametrize("shape", [
    (1, 16, 10, 10, 8),
    (2, 32, 9, 7, 8),
])
def test_resblock_interpret_matches_ref(monkeypatch, shape):
    monkeypatch.setenv("BODA_PALLAS_MODE", "interpret")
    n, C, H, W, Cm = shape
    op = _make_op(n, C, H, W, Cm)
    tmpl = get_template("resblock")
    rfs = tmpl.check_args(op)
    args = _args(n, C, H, W, Cm)
    got = np.asarray(tmpl.build(rfs)(*args))
    want = tmpl.ref_impl(rfs, *args)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_resblock_fallback_matches_ref(monkeypatch):
    monkeypatch.setenv("BODA_PALLAS_MODE", "fallback")
    n, C, H, W, Cm = 1, 16, 8, 8, 8
    op = _make_op(n, C, H, W, Cm, relu_out=False)
    tmpl = get_template("resblock")
    rfs = tmpl.check_args(op)
    args = _args(n, C, H, W, Cm, seed=3)
    got = np.asarray(tmpl.build(rfs)(*args))
    want = tmpl.ref_impl(rfs, *args)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)
    assert (want < 0).any()  # relu_out=0 respected


def test_resblock_fusion_pass_end_to_end():
    """lower_pipe(fuse_resblock=1) fuses the 12 identity bottlenecks of
    resnet-50 and the fused net matches the unfused one."""
    from boda_tpu.core.dims import NDA
    from boda_tpu.engine.iface import make_engine
    from boda_tpu.engine.lower import lower_pipe
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.cnn_variants import make_op_tune
    pipe = build_model("resnet-50", batch=1, ysz=64, xsz=64)
    plan = lower_pipe(pipe, make_op_tune("(use_culibs=1,fuse_resblock=1)"))
    assert sum(s.func_name == "resblock" for s in plan.steps) == 12
    d = pipe.get_data_img_dims()
    x = NDA(d, np.random.RandomState(0).randn(*d.shape).astype(np.float32) * 0.1)
    e1 = make_engine("(engine=rtc,fuse=1,op_tune=(use_culibs=1))")
    e1.init(pipe)
    e2 = make_engine("(engine=rtc,fuse=1,op_tune=(use_culibs=1,fuse_resblock=1))")
    e2.init(pipe)
    a = e1.run_fwd({"data": x}, ["prob"])["prob"].v
    b = e2.run_fwd({"data": x}, ["prob"])["prob"].v
    scale = np.abs(a).max() + 1e-30
    assert np.abs(a - b).max() / scale < 5e-4
