"""int8 conv execution path (OpTune quant8=1): dynamic per-tensor
activation + per-out_chan weight quantization inside each conv.
Reference role: the fixed-point quantize hooks (rtc_fwd.cc:28-37)
extended to actual int8 MXU execution."""

import numpy as np
import pytest

from boda_tpu.engine.lower import lower_pipe
from boda_tpu.engine.rtc_fwd import build_fused_forward
from boda_tpu.ops.cnn_variants import make_op_tune
from boda_tpu.ops.op_base import OpBase
from boda_tpu.ops.pallas.conv import make_conv_op
from boda_tpu.ops.registry import get_template

from tests.test_storage import resnet_micro


def test_quant8_single_conv_close_to_f32():
    op = make_conv_op(2, 32, 14, 14, 64, 3, 3, py=1, px=1, relu=True)
    op.set_u32("quant8", 1)
    tmpl = get_template("xla_conv")
    rfs = tmpl.check_args(op)
    assert rfs.get_u32_or("quant8", 0) == 1  # survives sig reduction
    fn_q = tmpl.build(rfs)
    rfs_f = tmpl.check_args(make_conv_op(2, 32, 14, 14, 64, 3, 3,
                                         py=1, px=1, relu=True))
    fn_f = tmpl.build(rfs_f)
    rng = np.random.RandomState(0)
    x = (rng.randn(2, 32, 14, 14) * 0.5).astype(np.float32)
    w = (rng.randn(64, 32, 3, 3) * 0.1).astype(np.float32)
    b = (rng.randn(64) * 0.01).astype(np.float32)
    yq = np.asarray(fn_q(x, w, b))
    yf = np.asarray(fn_f(x, w, b))
    mrd = np.abs(yq - yf).max() / (np.abs(yf).max() + 1e-9)
    assert mrd < 0.03, mrd  # int8 symmetric quant: ~1% typical


@pytest.mark.parametrize("storage", [False, True])
def test_quant8_whole_net_top1_agrees(storage):
    pipe = resnet_micro()
    d = pipe.get_data_img_dims()
    x = (np.random.RandomState(3).randn(*d.shape) * 0.3).astype(np.float32)
    weights = None

    def run(tune_s, fused):
        nonlocal weights
        plan = lower_pipe(pipe, make_op_tune(tune_s), fused_storage=fused)
        fwd = build_fused_forward(plan)
        if weights is None:
            weights = {n: pipe.op_params[n].v for n in plan.weight_nodes}
        return np.asarray(fwd({"data": x}, weights)["prob"]), plan

    base_tune = "(use_culibs=1,prec=bf16,layout=nhwc)" if storage \
        else "(use_culibs=1)"
    q_tune = base_tune[:-1] + ",quant8=1)"
    pf, _ = run(base_tune, storage)
    pq, plan_q = run(q_tune, storage)
    assert any(s.sig.get_u32_or("quant8", 0) == 1 for s in plan_q.steps)
    # stem (thin-channel) conv stays float
    for s in plan_q.steps:
        if s.sig.func_name == "xla_conv" and \
                s.sig.get_dims_or_none("filts") is not None and \
                s.sig.get_dims("filts")["in_chan"] < 16:
            assert s.sig.get_u32_or("quant8", 0) == 0
    top1_f = pf.reshape(d["img"], -1).argmax(1)
    top1_q = pq.reshape(d["img"], -1).argmax(1)
    assert (top1_f == top1_q).all()
    mrd = np.abs(pq - pf).max()
    assert mrd < 0.12, mrd  # prob-space drift from int8 quantization
