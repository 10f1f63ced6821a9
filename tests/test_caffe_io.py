"""Caffe import/export tests: prototxt round-trip, binary weights round-trip,
BN folding, fc→conv surgery (reference: caffepb.cc semantics + net-surgery
modes, tested via our own exporter since model downloads aren't available —
same strategy as the reference's archived-digest approach).
"""

import numpy as np
import pytest

from boda_tpu.core.dims import NDA, Dims
from boda_tpu.graph.caffe_io import (copy_matching_layer_blobs_to_pipe,
                                     create_pipe_from_param, extract_layer_blobs,
                                     fc_to_conv, fold_bn_scale, read_binary_net_param,
                                     read_model, resize_kernel, write_caffemodel,
                                     write_prototxt)
from boda_tpu.graph.pbtext import parse_pbtext, print_pbtext

V2_PROTOTXT = """
name: "tiny"
input: "data"
input_shape { dim: 1 dim: 3 dim: 16 dim: 16 }
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1 stride: 1 } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layer { name: "fc1" type: "InnerProduct" bottom: "pool1" top: "fc1"
  inner_product_param { num_output: 10 } }
layer { name: "prob" type: "Softmax" bottom: "fc1" top: "prob" }
"""

V1_PROTOTXT = """
name: "tiny_v1"
layers {
  top: "data" name: "data" type: DATA
  data_param { batch_size: 2 }
  transform_param { crop_size: 16 }
  include: { phase: TRAIN }
}
layers {
  top: "data" name: "data" type: DATA
  data_param { batch_size: 1 }
  transform_param { crop_size: 16 }
  include: { phase: TEST }
}
layers { bottom: "data" top: "conv1" name: "conv1" type: CONVOLUTION
  convolution_param { num_output: 4 kernel_size: 5 stride: 2 } }
layers { bottom: "conv1" top: "conv1" name: "relu1" type: RELU }
layers { bottom: "conv1" top: "prob" name: "prob" type: SOFTMAX }
"""


def test_pbtext_round_trip():
    n = parse_pbtext(V2_PROTOTXT)
    assert n.get("name") == "tiny"
    assert len(n.get_all("layer")) == 5
    txt = print_pbtext(n)
    n2 = parse_pbtext(txt)
    assert len(n2.get_all("layer")) == 5
    assert n2.get_all("layer")[0].get("convolution_param").get("num_output") == 8


def test_v2_import():
    pipe = create_pipe_from_param(parse_pbtext(V2_PROTOTXT))
    pipe.calc_dims()
    assert pipe.must_get_node("conv1").dims.shape == (1, 8, 16, 16)
    assert pipe.must_get_node("pool1").dims.shape == (1, 8, 8, 8)
    assert pipe.must_get_node("fc1").dims.shape == (1, 10, 1, 1)
    # relu is in-place on conv1's node
    assert pipe.must_get_node("conv1").in_place_ops[0].tag == "relu1"


def test_v1_import_phase_filter():
    pipe = create_pipe_from_param(parse_pbtext(V1_PROTOTXT), phase="TEST")
    pipe.calc_dims()
    # TEST-phase data layer sets batch 1, crop 16
    assert pipe.must_get_node("data").dims.shape == (1, 3, 16, 16)
    assert pipe.must_get_node("conv1").dims.shape == (1, 4, 6, 6)


def test_weights_and_prototxt_round_trip(tmp_path):
    from boda_tpu.models.zoo import build_model
    pipe = build_model("nin_imagenet_nopad", batch=1, ysz=192, xsz=192,
                       num_classes=10)
    write_prototxt(pipe, tmp_path / "net.prototxt", "nin_small")
    write_caffemodel(pipe, tmp_path / "net.caffemodel")
    pipe2 = read_model(tmp_path / "net.prototxt", tmp_path / "net.caffemodel",
                       in_dims=Dims.make(img=1, chan=3, y=192, x=192))
    # same structure
    assert pipe2.must_get_node("conv1").dims == pipe.must_get_node("conv1").dims
    top1, top2 = pipe.get_single_top_node(), pipe2.get_single_top_node()
    assert top1.dims == top2.dims
    # same weights
    for k, v in pipe.op_params.items():
        np.testing.assert_allclose(pipe2.op_params[k].v, v.v, rtol=1e-6,
                                   err_msg=k)
    # and same outputs end-to-end through the ref engine
    from boda_tpu.engine.iface import make_engine
    from boda_tpu.ops.pallas.gen_data import gen_test_nda
    d = pipe.get_data_img_dims()
    x = {"data": NDA(d, gen_test_nda(d, 0, 0.1))}
    e1 = make_engine("ref")
    e1.init(pipe)
    e2 = make_engine("ref")
    e2.init(pipe2)
    np.testing.assert_allclose(e1.run_fwd(x, ["prob"])["prob"].v,
                               e2.run_fwd(x, ["prob"])["prob"].v, rtol=1e-6)


BN_PROTOTXT = """
name: "bn_net"
input: "data"
input_shape { dim: 1 dim: 3 dim: 8 dim: 8 }
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 4 kernel_size: 3 pad: 1 } }
layer { name: "bn1" type: "BatchNorm" bottom: "conv1" top: "conv1" }
layer { name: "scale1" type: "Scale" bottom: "conv1" top: "conv1" }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "prob" type: "Softmax" bottom: "conv1" top: "prob" }
"""


def test_bn_scale_folding():
    rng = np.random.RandomState(0)
    pipe = create_pipe_from_param(parse_pbtext(BN_PROTOTXT))
    pipe.calc_dims()
    w = rng.randn(4, 3, 3, 3).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    mean = rng.randn(4).astype(np.float32)
    var = np.abs(rng.randn(4)).astype(np.float32) + 0.5
    gamma = rng.randn(4).astype(np.float32) + 1.0
    beta = rng.randn(4).astype(np.float32)
    blobs = {
        "conv1": [NDA.from_array(w, ["out_chan", "in_chan", "y", "x"]),
                  NDA.from_array(b, ["out_chan"])],
        "bn1": [NDA.from_array(mean, ["out_chan"]),
                NDA.from_array(var, ["out_chan"]),
                NDA.from_array(np.array([1.0], np.float32), ["out_chan"])],
        "scale1": [NDA.from_array(gamma, ["out_chan"]),
                   NDA.from_array(beta, ["out_chan"])],
    }
    copy_matching_layer_blobs_to_pipe(pipe, blobs)
    fold_bn_scale(pipe, blobs)
    assert not any(op.type in ("BatchNorm", "Scale") for op in pipe.ops.values())
    # run folded net; compare vs manual BN math
    from boda_tpu.engine.iface import make_engine
    d = pipe.get_data_img_dims()
    x = rng.randn(*d.shape).astype(np.float32)
    eng = make_engine("ref")
    eng.init(pipe)
    out = eng.run_fwd({"data": NDA(d, x)}, ["conv1"])["conv1"].v
    # manual: conv → bn → scale → relu (float64)
    from boda_tpu.ops.pallas.conv import _ConvBase, make_conv_op
    op = make_conv_op(1, 3, 8, 8, 4, 3, 3, py=1, px=1)
    rfs = __import__("boda_tpu.ops.registry", fromlist=["get_template"]) \
        .get_template("xla_conv").check_args(op)
    y = _ConvBase.ref_impl(rfs, x, w, b)
    inv = 1.0 / np.sqrt(var + 1e-5)
    y = (y - mean[None, :, None, None]) * inv[None, :, None, None]
    y = y * gamma[None, :, None, None] + beta[None, :, None, None]
    y = np.maximum(y, 0)
    np.testing.assert_allclose(out, y, rtol=1e-4, atol=1e-5)


def test_fc_to_conv():
    pipe = create_pipe_from_param(parse_pbtext(V2_PROTOTXT))
    pipe.calc_dims()
    from boda_tpu.models.zoo import init_pipe_weights
    init_pipe_weights(pipe)
    # reshape IP weights to flat fc layout first (oc, in_chan*y*x)
    w = pipe.op_params["fc1_filts"]
    fc_to_conv(pipe)
    assert pipe.get_op("fc1").type == "Convolution"
    assert pipe.op_params["fc1_filts"].dims.names() == ("out_chan", "in_chan", "y", "x")
    assert pipe.op_params["fc1_filts"].dims.shape == (10, 8, 8, 8)


def test_resize_kernel():
    rng = np.random.RandomState(1)
    w = rng.randn(2, 3, 5, 5).astype(np.float32)
    w2 = resize_kernel(w, 3, 3)
    assert w2.shape == (2, 3, 3, 3)
    # integral preserved per filter
    np.testing.assert_allclose(w2.sum(axis=(2, 3)), w.sum(axis=(2, 3)), rtol=1e-3)
    assert np.array_equal(resize_kernel(w, 5, 5), w)


def test_binary_weights_format(tmp_path):
    from boda_tpu.models.zoo import NetBuilder
    b = NetBuilder("t", 1, 3, 8, 8)
    b.conv("c1", 4, 3, 1, 1)
    pipe = b.done(seed=3)
    write_caffemodel(pipe, tmp_path / "w.caffemodel", "t")
    blobs = extract_layer_blobs(read_binary_net_param(tmp_path / "w.caffemodel"))
    assert "c1" in blobs
    np.testing.assert_allclose(blobs["c1"][0].v, pipe.op_params["c1_filts"].v)
    assert blobs["c1"][0].dims.shape == (4, 3, 3, 3)


HDR = """
name: "t"
input: "data"
input_shape { dim: 1 dim: 3 dim: 16 dim: 16 }
"""


def test_unsupported_conv_features_error():
    """group/dilation must fail at PARSE time: silently ignoring group
    crashed weight copy with a raw reshape error, silently ignoring
    dilation computed a different net (the reference ignored both and
    shipped _ng 'no groups' net variants)."""
    import pytest

    from boda_tpu.core.error import RtErr
    g = HDR + ('layer { name: "c" type: "Convolution" bottom: "data" '
               'top: "c" convolution_param { num_output: 8 '
               'kernel_size: 3 group: 2 } }')
    with pytest.raises(RtErr, match="group=2"):
        create_pipe_from_param(parse_pbtext(g))
    d = HDR + ('layer { name: "c" type: "Convolution" bottom: "data" '
               'top: "c" convolution_param { num_output: 8 '
               'kernel_size: 3 dilation: 2 } }')
    with pytest.raises(RtErr, match="dilation"):
        create_pipe_from_param(parse_pbtext(d))
    s = HDR + ('layer { name: "p" type: "Pooling" bottom: "data" top: "p" '
               'pooling_param { pool: STOCHASTIC kernel_size: 2 } }')
    with pytest.raises(RtErr, match="STOCHASTIC"):
        create_pipe_from_param(parse_pbtext(s))


def test_non_inplace_relu_with_other_consumer_errors():
    """ReLU(bottom=conv1, top=relu1) while another layer also reads conv1:
    aliasing would silently hand the branch POST-activation values."""
    import pytest

    from boda_tpu.core.error import RtErr
    p = HDR + """
layer { name: "c1" type: "Convolution" bottom: "data" top: "c1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1 } }
layer { name: "r1" type: "ReLU" bottom: "c1" top: "r1" }
layer { name: "c2" type: "Convolution" bottom: "c1" top: "c2"
  convolution_param { num_output: 8 kernel_size: 1 } }
layer { name: "cat" type: "Concat" bottom: "r1" bottom: "c2" top: "cat" }
"""
    with pytest.raises(RtErr, match="other consumers"):
        create_pipe_from_param(parse_pbtext(p))
    # the single-consumer form still imports (plain alias)
    ok = HDR + """
layer { name: "c1" type: "Convolution" bottom: "data" top: "c1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1 } }
layer { name: "r1" type: "ReLU" bottom: "c1" top: "r1" }
layer { name: "prob" type: "Softmax" bottom: "r1" top: "prob" }
"""
    pipe = create_pipe_from_param(parse_pbtext(ok))
    pipe.calc_dims()
    assert "prob" in pipe.tops


def test_eltwise_chan_mismatch_errors():
    import pytest

    from boda_tpu.core.error import RtErr
    p = HDR + """
layer { name: "a" type: "Convolution" bottom: "data" top: "a"
  convolution_param { num_output: 8 kernel_size: 1 } }
layer { name: "b" type: "Convolution" bottom: "data" top: "b"
  convolution_param { num_output: 16 kernel_size: 1 } }
layer { name: "s" type: "Eltwise" bottom: "a" bottom: "b" top: "s" }
"""
    pipe = create_pipe_from_param(parse_pbtext(p))
    with pytest.raises(RtErr, match="chan=16 != chan=8"):
        pipe.calc_dims()


def test_blob_default_dim_names():
    """2-d InnerProduct weight blobs default to (out_chan,in_chan) and
    1-d bias blobs to (out_chan,) when no hint dims exist."""
    import numpy as np

    from boda_tpu.graph.caffe_io import _blob_to_nda
    from boda_tpu.graph.pbwire import WireNode

    class FakeBlob:
        def __init__(self, shape):
            self._shape = shape

        def floats(self, _):
            return np.zeros(int(np.prod(self._shape)), np.float32)

        def msg(self, _):
            class S:
                def __init__(s, dims):
                    s._d = dims

                def varints(s, _):
                    return s._d
            return S(self._shape)

    nda2 = _blob_to_nda(FakeBlob([10, 64]))
    assert [d.name for d in nda2.dims] == ["out_chan", "in_chan"]
    nda1 = _blob_to_nda(FakeBlob([10]))
    assert [d.name for d in nda1.dims] == ["out_chan"]


PARAM_MULT_PROTOTXT = """
name: "pm"
input: "data"
input_shape { dim: 1 dim: 3 dim: 8 dim: 8 }
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  param { lr_mult: 0 decay_mult: 0 }
  param { lr_mult: 2 decay_mult: 0 }
  convolution_param { num_output: 4 kernel_size: 3 pad: 1 } }
layer { name: "fc1" type: "InnerProduct" bottom: "conv1" top: "fc1"
  inner_product_param { num_output: 5 } }
layer { name: "prob" type: "Softmax" bottom: "fc1" top: "prob" }
"""

V1_PARAM_MULT_PROTOTXT = """
name: "pm_v1"
input: "data"
input_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8
layers { bottom: "data" top: "conv1" name: "conv1" type: CONVOLUTION
  blobs_lr: 1 blobs_lr: 2 weight_decay: 1 weight_decay: 0
  convolution_param { num_output: 4 kernel_size: 3 pad: 1 } }
layers { bottom: "conv1" top: "prob" name: "prob" type: SOFTMAX }
"""


def test_param_spec_mults_import_and_export():
    """caffe ParamSpec parity: V2 param{lr_mult,decay_mult} blocks land
    in pipe.param_mults keyed by weight node ([filts, biases] order),
    default-(1,1) specs are not recorded, and the exporter round-trips
    non-default specs."""
    from boda_tpu.graph.caffe_io import pipe_to_net_param
    pipe = create_pipe_from_param(parse_pbtext(PARAM_MULT_PROTOTXT))
    assert pipe.param_mults == {"conv1_filts": (0.0, 0.0),
                                "conv1_biases": (2.0, 0.0)}
    net2 = pipe_to_net_param(pipe)
    rt = create_pipe_from_param(net2)
    assert rt.param_mults == pipe.param_mults
    # fc1 had no specs -> no param blocks emitted for it
    fc_l = [l for l in net2.get_all("layer") if l.get("name") == "fc1"][0]
    assert not fc_l.get_all("param")


def test_param_spec_mults_v1_blobs_lr():
    """V1 layers carry repeated blobs_lr / weight_decay floats."""
    pipe = create_pipe_from_param(parse_pbtext(V1_PARAM_MULT_PROTOTXT))
    assert pipe.param_mults == {"conv1_biases": (2.0, 0.0)}
