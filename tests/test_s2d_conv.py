"""s2d_conv (space-to-depth first-layer conv) exactness tests: the phase
re-indexing must reproduce the original stride-2 conv bit-for-bit in f32
(same MACs, re-grouped), pinned against both the numpy reference and
xla_conv."""

import numpy as np
import pytest

from boda_tpu.ops.cnn_variants import add_cnn_codegen_annotations, make_op_tune
from boda_tpu.ops.pallas.conv import make_conv_op
from boda_tpu.ops.registry import get_template


def _run(n, cin, h, w, cout, k, pad, relu=True, bias=True):
    op = make_conv_op(n, cin, h, w, cout, k, k, 2, 2, pad, pad,
                      func_name="s2d_conv", relu=relu, bias=bias)
    tmpl = get_template("s2d_conv")
    rfs = tmpl.check_args(op)
    fn = tmpl.build(rfs)
    rng = np.random.RandomState(0)
    x = rng.randn(n, cin, h, w).astype(np.float32) * 0.3
    wts = rng.randn(cout, cin, k, k).astype(np.float32) * 0.3
    args = [x, wts]
    if bias:
        args.append(rng.randn(cout).astype(np.float32))
    got = np.asarray(fn(*args))
    want = np.asarray(tmpl.ref_impl(rfs, *args))
    return got, want


@pytest.mark.parametrize("case", [
    dict(n=1, cin=3, h=224, w=224, cout=64, k=7, pad=3),   # resnet conv1
    dict(n=2, cin=3, h=32, w=32, cout=8, k=5, pad=2),
    dict(n=1, cin=4, h=30, w=26, cout=16, k=3, pad=1, relu=False),
    dict(n=1, cin=3, h=31, w=29, cout=8, k=7, pad=3, bias=False),
])
def test_s2d_conv_matches_ref(case):
    got, want = _run(**case)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_variant_selection_picks_s2d_for_conv1():
    op = make_conv_op(1, 3, 224, 224, 64, 7, 7, 2, 2, 3, 3)
    add_cnn_codegen_annotations(op, make_op_tune("(use_culibs=1,prec=bf16)"), None)
    assert op.func_name == "s2d_conv"
    # disabled by s2d=0
    op2 = make_conv_op(1, 3, 224, 224, 64, 7, 7, 2, 2, 3, 3)
    add_cnn_codegen_annotations(op2, make_op_tune("(use_culibs=1,s2d=0)"), None)
    assert op2.func_name == "xla_conv"
    # not selected for fat-channel stride-2 convs
    op3 = make_conv_op(1, 64, 56, 56, 128, 3, 3, 2, 2, 1, 1)
    add_cnn_codegen_annotations(op3, make_op_tune("()"), None)
    assert op3.func_name != "s2d_conv"


def test_whole_net_with_s2d_matches_without():
    """ResNet-ish first layer inside a small fused net: s2d on/off digests
    agree (f32)."""
    from boda_tpu.engine.lower import lower_pipe, resolve_plan_weights
    from boda_tpu.engine.rtc_fwd import build_fused_forward
    from boda_tpu.models.zoo import NetBuilder
    b = NetBuilder("s2dnet", batch=2, chans=3, ysz=48, xsz=48)
    b.conv("conv1", 16, 7, 2, 3)
    b.pool("pool1", 3, 2)
    b.conv("conv2", 8, 1, relu=False)
    b.pool("gpool", 0, 1, avg=True, global_=True)
    b.softmax("prob")
    pipe = b.done(seed=3)
    x = np.random.RandomState(1).randn(2, 3, 48, 48).astype(np.float32) * 0.2
    outs = {}
    for s2d in ("0", "1"):
        plan = lower_pipe(pipe, make_op_tune(f"(s2d={s2d})"))
        fns = [st.func_name for st in plan.steps]
        assert ("s2d_conv" in fns) == (s2d == "1"), fns
        fwd = build_fused_forward(plan)
        w = resolve_plan_weights(plan, pipe.op_params)
        outs[s2d] = np.asarray(fwd({"data": x}, w)["prob"])
    np.testing.assert_allclose(outs["0"], outs["1"], rtol=1e-5, atol=1e-6)
