"""fused_stem kernel (conv 7x7s2 + ReLU + maxpool 3x3s2 in one Pallas
kernel; VERDICT r2 #1a measured-not-on-paper item) — interpret-mode body
tests vs the independent numpy reference, fallback-path equivalence, the
lowering fusion pass, and end-to-end engine agreement."""

import numpy as np
import pytest

from boda_tpu.core.dims import NDA
from boda_tpu.engine.iface import make_engine
from boda_tpu.models.zoo import build_model
from boda_tpu.ops.pallas.gen_data import gen_test_nda
from boda_tpu.ops.pallas.stem import make_stem_op
from boda_tpu.ops.registry import get_template

MRD_TOLER = 5e-4


def mrd(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.maximum(np.abs(a), np.abs(b)).max() + 1e-30)


def _run(monkeypatch, mode, n=1, cin=3, h=56, w=56, cout=16, k=7,
         io_layout="", prec="", bias=True):
    monkeypatch.setenv("BODA_PALLAS_MODE", mode)
    op = make_stem_op(n, cin, h, w, cout, k=k, bias=bias)
    if io_layout:
        op.str_vals["io_layout"] = io_layout
    if prec:
        op.str_vals["prec"] = prec
    tmpl = get_template("fused_stem")
    rfs = tmpl.check_args(op)
    fn = tmpl.build(rfs)
    rng = np.random.RandomState(0)
    x = rng.randn(n, cin, h, w).astype(np.float32) * 0.3
    wts = rng.randn(cout, cin, k, k).astype(np.float32) * 0.3
    args = [x, wts] + ([rng.randn(cout).astype(np.float32)] if bias else [])
    if io_layout == "nhwc":
        got = np.asarray(fn(np.transpose(x, (0, 2, 3, 1)), *args[1:]),
                         np.float32)
        got = np.transpose(got, (0, 3, 1, 2))
    else:
        got = np.asarray(fn(*args))
    want = np.asarray(tmpl.ref_impl(rfs, *args))
    return got, want


@pytest.mark.parametrize("case", [
    dict(),                                   # f32 NCHW
    dict(io_layout="nhwc"),                   # storage path
    dict(n=2, h=48, w=40, cout=8, bias=False),  # non-square, no bias
    dict(h=58, w=58),                         # cx not tile-aligned -> mask
])
def test_stem_interpret_matches_ref(monkeypatch, case):
    got, want = _run(monkeypatch, "interpret", **case)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_stem_interpret_bf16_nhwc(monkeypatch):
    got, want = _run(monkeypatch, "interpret", io_layout="nhwc", prec="bf16")
    assert mrd(got, want) < 2e-2


def test_stem_fallback_matches_ref(monkeypatch):
    got, want = _run(monkeypatch, "fallback", io_layout="nhwc")
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_fuse_stem_lowering_pass():
    from boda_tpu.engine.lower import lower_pipe
    from boda_tpu.ops.cnn_variants import make_op_tune
    pipe = build_model("resnet-50", batch=1)
    plan = lower_pipe(pipe, make_op_tune("(use_culibs=1,fuse_stem=1,s2d=0)"))
    fns = [s.func_name for s in plan.steps]
    assert "fused_stem" in fns[:1], fns[:3]   # conv1+pool1 became step 0
    assert "pool" not in fns[:2]
    # and with the knob off, nothing changes
    plan2 = lower_pipe(pipe, make_op_tune("(use_culibs=1,s2d=0)"))
    assert plan2.steps[0].func_name == "xla_conv"


def test_engine_agrees_with_fuse_stem():
    pipe = build_model("resnet-50", batch=1, ysz=64, xsz=64)
    d = pipe.get_data_img_dims()
    blob = {"data": NDA(d, gen_test_nda(d, 0, 0.1))}
    base = make_engine("(engine=rtc,op_tune=(use_culibs=1,s2d=0))")
    base.init(pipe)
    want = base.run_fwd(blob, ["prob"])["prob"].v
    fused = make_engine("(engine=rtc,op_tune=(use_culibs=1,fuse_stem=1,s2d=0))")
    fused.init(pipe)
    got = fused.run_fwd(blob, ["prob"])["prob"].v
    assert mrd(got, want) < MRD_TOLER


def test_engine_agrees_with_fuse_stem_storage_pass():
    pipe = build_model("resnet-50", batch=1, ysz=64, xsz=64)
    d = pipe.get_data_img_dims()
    blob = {"data": NDA(d, gen_test_nda(d, 0, 0.1))}
    base = make_engine("(engine=rtc,op_tune=(use_culibs=1,s2d=0))")
    base.init(pipe)
    want = base.run_fwd(blob, ["prob"])["prob"].v
    fused = make_engine("(engine=rtc,op_tune=(use_culibs=1,fuse_stem=1,"
                        "s2d=0,prec=bf16,layout=nhwc))")
    fused.init(pipe)
    got = fused.run_fwd(blob, ["prob"])["prob"].v
    assert mrd(got, want) < 3e-2  # bf16 edges
