"""tconv (spatial-tiled Pallas conv) op-level tests: kernel body exercised
in interpret mode off-TPU against the independent numpy conv reference
(reference variant: tconv.cucl / cnn_op.cc:158-192)."""

import numpy as np
import pytest

from boda_tpu.ops.pallas.conv import make_conv_op
from boda_tpu.ops.registry import get_template


def _run_tconv(monkeypatch, n, cin, h, w, cout, k, pad, relu, bias,
               work=None, prec=""):
    monkeypatch.setenv("BODA_PALLAS_MODE", "interpret")
    op = make_conv_op(n, cin, h, w, cout, k, k, 1, 1, pad, pad,
                      func_name="tconv", relu=relu, bias=bias)
    if prec:
        op.str_vals["prec"] = prec
    if work:
        from boda_tpu.core.dims import Dims
        op.set_dims("work", Dims.make(tn="none", **work))
    tmpl = get_template("tconv")
    rfs = tmpl.check_args(op)
    fn = tmpl.build(rfs)
    rng = np.random.RandomState(0)
    x = rng.randn(n, cin, h, w).astype(np.float32) * 0.3
    wts = rng.randn(cout, cin, k, k).astype(np.float32) * 0.3
    args = [x, wts]
    if bias:
        args.append(rng.randn(cout).astype(np.float32))
    got = np.asarray(fn(*args))
    want = tmpl.ref_impl(rfs, *args)
    return got, np.asarray(want)


@pytest.mark.parametrize("case", [
    dict(n=1, cin=8, h=10, w=10, cout=16, k=3, pad=1, relu=False, bias=False),
    dict(n=2, cin=16, h=9, w=9, cout=32, k=3, pad=1, relu=True, bias=True),
    dict(n=1, cin=4, h=12, w=8, cout=8, k=5, pad=2, relu=False, bias=True),
    dict(n=1, cin=8, h=7, w=7, cout=8, k=1, pad=0, relu=True, bias=False),
])
def test_tconv_matches_ref(monkeypatch, case):
    got, want = _run_tconv(monkeypatch, **case)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_tconv_ty_tiling(monkeypatch):
    # force multiple y-bands (TY=4 over oy=10) and oc blocks
    got, want = _run_tconv(monkeypatch, n=1, cin=8, h=10, w=10, cout=16, k=3,
                           pad=1, relu=False, bias=True,
                           work=dict(Mb=4, Nb=128))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_tconv_selected_by_variant_gate():
    from boda_tpu.ops.cnn_variants import add_cnn_codegen_annotations, make_op_tune
    op = make_conv_op(1, 128, 14, 14, 32, 3, 3, 1, 1, 1, 1)
    add_cnn_codegen_annotations(op, make_op_tune("()"))
    assert op.func_name == "tconv"
    # strided conv falls back to the im2col path
    op2 = make_conv_op(1, 128, 14, 14, 32, 3, 3, 2, 2, 1, 1)
    add_cnn_codegen_annotations(op2, make_op_tune("()"))
    assert op2.func_name == "conv"
    # lane dim (in_chan) must be a 128-multiple for the Mosaic kernel
    op3 = make_conv_op(1, 16, 14, 14, 32, 3, 3, 1, 1, 1, 1)
    add_cnn_codegen_annotations(op3, make_op_tune("()"))
    assert op3.func_name == "conv"
