"""Upsampled-companion-net tests (reference: enable_upsamp_net
caffeif.cc:185-236, create_upsamp_layer_weights caffepb.cc:795-820,
test_upsamp test_dense.cc:145)."""

import numpy as np
import pytest

from boda_tpu.core.error import RtErr
from boda_tpu.core.has_main import create_and_run_has_main
from boda_tpu.models.upsamp import (first_conv_op, fold_filters_2x,
                                    make_upsamp_pipe, upsample_2x_nn)
from boda_tpu.models.zoo import build_model


def test_fold_filters():
    w = np.arange(2 * 3 * 4 * 6, dtype=np.float32).reshape(2, 3, 4, 6)
    f = fold_filters_2x(w)
    assert f.shape == (2, 3, 2, 3)
    assert f[0, 0, 0, 0] == w[0, 0, 0, 0] + w[0, 0, 0, 1] + w[0, 0, 1, 0] + w[0, 0, 1, 1]
    assert f.sum() == pytest.approx(w.sum())
    # odd kernel: last row/col fold alone
    w5 = np.ones((1, 1, 5, 5), np.float32)
    f5 = fold_filters_2x(w5)
    assert f5.shape == (1, 1, 3, 3)
    assert f5[0, 0, 2, 2] == 1 and f5[0, 0, 0, 0] == 4 and f5[0, 0, 0, 2] == 2


def test_make_upsamp_pipe_geometry():
    pipe = build_model("mini", batch=1, ysz=64, xsz=64)
    up = make_upsamp_pipe(pipe, in_dims=pipe.get_data_img_dims()
                          .with_dim("y", 32).with_dim("x", 32))
    op = first_conv_op(up)
    assert (op.kern_sz().y, op.stride().y, op.in_pad().y) == (3, 1, 1)
    # folded weights live under the same node name
    assert up.op_params["conv1_filts"].v.shape == (16, 3, 3, 3)
    # full-size companion keeps the source input dims
    up_full = make_upsamp_pipe(pipe)
    assert up_full.get_data_img_dims() == pipe.get_data_img_dims()


def test_upsamp_equivalence_exact():
    """companion(I) == original(nn_upsample_2x(I)) through the whole mini
    net (exact folded-filter identity; fp32 accumulation noise only)."""
    from boda_tpu.core.dims import NDA
    from boda_tpu.engine.iface import make_engine
    pipe = build_model("mini", batch=1, ysz=64, xsz=64)
    d = pipe.get_data_img_dims()
    half = d.with_dim("y", 32).with_dim("x", 32)
    up = make_upsamp_pipe(pipe, in_dims=half)
    rng = np.random.RandomState(0)
    x = rng.randn(*half.shape).astype(np.float32)
    e1 = make_engine("(engine=rtc,fuse=1)")
    e1.init(up)
    p_up = e1.run_fwd({"data": NDA(half, x)}, ["prob"])["prob"].v
    e2 = make_engine("(engine=rtc,fuse=1)")
    e2.init(pipe)
    xu = upsample_2x_nn(x)
    p_full = e2.run_fwd({"data": NDA(d, xu)}, ["prob"])["prob"].v
    np.testing.assert_allclose(p_up, p_full, rtol=2e-4, atol=1e-6)


def test_upsamp_mode(capsys):
    create_and_run_has_main(
        "(mode=test_upsamp,model=mini,in_dims=(dims=(img=1,y=64,x=64)))", {})
    out = capsys.readouterr().out
    assert "test_upsamp PASSED" in out


def test_odd_stride_rejected():
    pipe = build_model("mini", batch=1, ysz=64, xsz=64)
    op = first_conv_op(pipe)
    op._set_param("stride", (3, 3))
    with pytest.raises(RtErr, match="odd stride"):
        make_upsamp_pipe(pipe)


def test_run_cnet_enable_upsamp():
    from boda_tpu.apps.run_cnet import RunCnet

    t = RunCnet.init_from_lexp("(model=mini,"
                               "in_dims=(dims=(img=1,y=64,x=64)),"
                               "enable_upsamp_net=1)")
    t.setup_cnet()
    from boda_tpu.core.dims import NDA
    d = t.pipe_upsamp.get_data_img_dims()
    assert d["y"] == 64  # companion keeps input size (2x-res features)
    x = np.random.RandomState(1).randn(*d.shape).astype(np.float32)
    out = t.run_one_blob_in_one_blob_out_upsamp(NDA(d, x))
    assert out.v.shape[1] == 10
