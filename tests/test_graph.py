"""Graph IR tests: shape inference, support math, topo order, dumps
(reference: conv_util semantics + test_dense support-math assumptions).
"""

import pytest

from boda_tpu.core.error import RtErr
from boda_tpu.core.geom import Box, Pt
from boda_tpu.graph.pipe import ConvOp, ConvPipe
from boda_tpu.graph.support import (CM_ANY_VALID, CM_CORE_VALID, CM_VALID,
                                    SupportInfo, conv_in_sz_to_out_sz,
                                    in_box_to_out_box, pool_in_sz_to_out_sz,
                                    unchecked_out_box_to_in_box)
from boda_tpu.models.zoo import build_model, build_nin


def test_conv_out_sz():
    # 227x227, k=11, s=4, p=0 → 55 (alexnet conv1)
    assert conv_in_sz_to_out_sz(Pt(227, 227), Pt(0, 0), Pt(4, 4), Pt(11, 11)) == Pt(55, 55)
    # caffe pool ceil mode: 55, k=3, s=2 → 27... ceil((55-3)/2)+1 = 27
    assert pool_in_sz_to_out_sz(Pt(55, 55), Pt(0, 0), Pt(2, 2), Pt(3, 3)) == Pt(27, 27)
    # pool ceil picks up partial windows: 13, k=3, s=2 → ceil(10/2)+1 = 6
    assert pool_in_sz_to_out_sz(Pt(13, 13), Pt(0, 0), Pt(2, 2), Pt(3, 3)) == Pt(6, 6)
    # conv floor mode: 13, k=3, s=2, p=0 → 6
    assert conv_in_sz_to_out_sz(Pt(13, 13), Pt(0, 0), Pt(2, 2), Pt(3, 3)) == Pt(6, 6)
    # padding: 224, k=3, s=1, p=1 → 224
    assert conv_in_sz_to_out_sz(Pt(224, 224), Pt(1, 1), Pt(1, 1), Pt(3, 3)) == Pt(224, 224)


def test_support_box_round_trip():
    csi = SupportInfo(support_sz=Pt(11, 11), support_stride=Pt(4, 4),
                      eff_tot_pad=Pt(0, 0))
    ib = Box(Pt(0, 0), Pt(227, 227))
    ob = in_box_to_out_box(ib, CM_VALID, csi)
    assert ob == Box(Pt(0, 0), Pt(55, 55))
    back = unchecked_out_box_to_in_box(ob, CM_VALID, csi)
    assert back.p0 == Pt(0, 0)
    assert back.p1 == Pt(11 + 54 * 4, 11 + 54 * 4)  # = 227
    # stride-1 odd-kernel core_valid with enough padding behaves 'same'-like
    csi2 = SupportInfo(Pt(3, 3), Pt(1, 1), Pt(1, 1))
    ob2 = in_box_to_out_box(Box(Pt(0, 0), Pt(8, 8)), CM_CORE_VALID, csi2)
    assert ob2 == Box(Pt(0, 0), Pt(8, 8))
    # any_valid covers more outputs than valid
    ob_any = in_box_to_out_box(Box(Pt(0, 0), Pt(16, 16)), CM_ANY_VALID, csi2)
    ob_val = in_box_to_out_box(Box(Pt(0, 0), Pt(16, 16)), CM_VALID, csi2)
    assert ob_any.area() >= ob_val.area()


def _tiny_pipe(batch=1):
    p = ConvPipe()
    from boda_tpu.core.dims import Dims
    p.get_or_make_node("data", False, False).dims = Dims.make(img=batch, chan=3, y=32, x=32)
    p.data_img_node_names = ["data"]
    p.add_op(ConvOp("Convolution", "conv1", ["data", "conv1_f", "conv1_b"], ["conv1"],
                    {"out_chans": 8, "kern_sz": (3, 3), "stride": (1, 1), "in_pad": (1, 1)}))
    p.add_op(ConvOp("ReLU", "relu1", ["conv1"], ["conv1"]))
    p.add_op(ConvOp("Pooling", "pool1", ["conv1"], ["pool1"],
                    {"kern_sz": (2, 2), "stride": (2, 2)}))
    p.add_op(ConvOp("Softmax", "prob", ["pool1"], ["prob"]))
    p.calc_dims()
    p.calc_support_info()
    return p


def test_pipe_shapes_and_topo():
    p = _tiny_pipe()
    assert p.must_get_node("conv1").dims.shape == (1, 8, 32, 32)
    assert p.must_get_node("pool1").dims.shape == (1, 8, 16, 16)
    assert p.must_get_node("conv1_f").dims.shape == (8, 3, 3, 3)
    order = [o.tag for o in p.topo_order()]
    assert order == ["conv1", "pool1", "prob"]
    # relu is in-place, attached to conv1's node
    assert p.must_get_node("conv1").in_place_ops[0].tag == "relu1"
    # support: conv1 3x3 s1 then pool 2x2 s2
    csi = p.must_get_node("pool1").csi
    assert csi.support_stride == Pt(2, 2)
    assert p.get_single_top_node().name == "prob"


def test_pipe_errors():
    p = ConvPipe()
    p.add_op(ConvOp("ReLU", "r1", ["a"], ["a"]))
    with pytest.raises(RtErr, match="duplicate conv op"):
        p.add_op(ConvOp("ReLU", "r1", ["a"], ["a"]))
    p2 = _tiny_pipe()
    with pytest.raises(RtErr, match="no node 'zz'"):
        p2.must_get_node("zz")


def test_dumps(capsys):
    p = _tiny_pipe()
    p.dump_pipe()
    p.dump_ios()
    p.dump_ops()
    out = capsys.readouterr().out
    assert "== BEGIN dump_pipe ==" in out
    assert "conv1: type=Convolution" in out
    assert "pool1: chan:8,y:16,x:16" in out or "pool1: img:1,chan:8,y:16,x:16" in out
    assert "func_name=" in out or "type=Convolution" in out


@pytest.mark.parametrize("name,top_shape", [
    ("nin_imagenet_nopad", (1, 1000, 1, 1)),
    ("squeezenet-1.0", (1, 1000, 1, 1)),
    ("alexnet_ng_conv", (1, 1000, 1, 1)),
])
def test_model_zoo_shapes(name, top_shape):
    pipe = build_model(name, batch=1)
    top = pipe.get_single_top_node()
    assert top.dims.shape == top_shape, f"{name}: {top.dims.shape}"


def test_resnet50_shapes():
    pipe = build_model("resnet-50", batch=1)
    assert pipe.must_get_node("res2c").dims.shape == (1, 256, 56, 56)
    assert pipe.must_get_node("res5c").dims.shape == (1, 2048, 7, 7)
    assert pipe.get_single_top_node().dims.shape == (1, 1000, 1, 1)
    n_convs = sum(1 for o in pipe.ops.values() if o.type == "Convolution")
    assert n_convs == 54  # 53 + fc1000-conv
    flops, _ = pipe.total_flops_and_bytes()
    assert 7.5e9 < flops < 8.5e9  # ~7.7 GFLOPs for resnet-50 at 224


def test_vgg16_flops():
    pipe = build_model("vgg16-conv", batch=1)
    flops, _ = pipe.total_flops_and_bytes()
    assert 30e9 < flops < 32e9  # ~30.9 GFLOPs


def test_googlenet_builds():
    pipe = build_model("googlenet_conv", batch=1)
    assert pipe.get_single_top_node().dims.shape == (1, 1000, 1, 1)


def test_cnet_util_identity_preserves_function(tmp_path, capsys):
    """cnet_util (caffepb.cc:992 role): inserting an identity 1x1 conv
    must not change the net's outputs."""
    import numpy as np
    from boda_tpu.core.dims import NDA
    from boda_tpu.core.has_main import create_and_run_has_main
    from boda_tpu.engine.iface import make_engine
    from boda_tpu.graph.caffe_io import read_model
    from boda_tpu.models.zoo import build_model
    create_and_run_has_main(
        f"(mode=cnet_util,model=mini,add_before_ln=conv2,"
        f"out_ptt_fn=mod.prototxt,out_trained_fn=mod.caffemodel,"
        f"boda_output_dir={tmp_path})", {})
    assert "inserted identity conv" in capsys.readouterr().out
    orig = build_model("mini")
    mod = read_model(tmp_path / "mod.prototxt", tmp_path / "mod.caffemodel",
                     in_dims=orig.get_data_img_dims())
    d = orig.get_data_img_dims()
    x = NDA(d, np.random.RandomState(0).randn(*d.shape).astype(np.float32))
    e1 = make_engine("ref")
    e1.init(orig)
    e2 = make_engine("ref")
    e2.init(mod)
    p1 = e1.run_fwd({"data": x}, ["prob"])["prob"].v
    p2 = e2.run_fwd({"data": x}, ["prob"])["prob"].v
    np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-7)


def test_cnet_bpt_dump(capsys):
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main("(mode=cnet_bpt_dump,model=mini)", {})
    out = capsys.readouterr().out
    assert "layer conv1: type=Convolution" in out
    assert "blob conv1_filts: out_chan:16,in_chan:3,y:5,x:5" in out


@pytest.mark.parametrize("depth", [50, 101, 152])
def test_resnet_zoo_names_match_caffe(depth):
    """Zoo resnet block tags follow caffe's naming exactly (res4a,
    res4b1..res4b35 for deep stages): chr(ord('a')+r) past 26 blocks
    produced NON-PRINTABLE tags ('res4\\x7f') that every [a-z0-9] site
    regex (int8 presets, calibration) silently skipped — resnet-152 ran
    10 of 36 stage-4 blocks un-quantized while reporting the int8 config."""
    import re
    from pathlib import Path
    pipe = build_model(f"resnet-{depth}", batch=1, ysz=32, xsz=32)
    got = {op.tag for op in pipe.ops.values()
           if re.fullmatch(r"res[0-9][a-z0-9]*", op.tag)}
    assert all(t.isascii() and t.isprintable() for t in got)
    ref = Path(f"/root/reference/nets/resnet-{depth}/train_val.prototxt")
    if not ref.exists():
        pytest.skip("reference prototxt unavailable")
    want = set(re.findall(r'name: "(res[0-9][a-z0-9]*)"', ref.read_text()))
    assert got == want
    # and the int8 preset site set covers EVERY deep-stage 3x3
    from boda_tpu.tune.presets import resnet_int8_site_tunes
    site = resnet_int8_site_tunes(pipe, "(use_culibs=1)")
    n_3x3_s345 = sum(1 for op in pipe.ops.values()
                     if op.tag.endswith("_branch2b")
                     and op.tag[3] in "345")
    assert sum(1 for t in site if t.endswith("_branch2b")
               and t[3] in "345") == n_3x3_s345
