"""Importer compatibility against the reference's actual caffe prototxts
(read from /root/reference/nets/ when mounted; skipped elsewhere). This is
the real-world surface of the caffepb front-end — upgrade handling, legacy
`layers`/V1 enum types, train/test phase layers, in-place chains."""

from pathlib import Path

import numpy as np
import pytest

REF_NETS = Path("/root/reference/nets")

pytestmark = pytest.mark.skipif(not REF_NETS.exists(),
                                reason="reference nets not mounted")

# every net in the reference zoo that the importer must load, with its
# expected first conv out_chans as a parse sanity check
CASES = [
    ("nin_imagenet", 96),
    ("nin_imagenet_nopad", 96),
    ("alexnet_ng_conv", 96),
    ("VGG16-v2-conv", 64),
    ("vgg_19", 64),
    ("googlenet_conv", 64),
    ("googlenet_conv_no_lrn", 64),
    ("firenet-v0", 96),
    ("firenet8-CE-0.125", 96),
    ("firenet8-CE-0.125-nofinalpad", 96),
    ("squeezenet-1.0", 96),
    ("resnet-50", 64),
    ("resnet-101", 64),
    ("resnet-152", 64),
    ("stratosnet-conv", 32),
    ("bconv_strides_1", 96),
    ("alexnet_ng_conv_nd_nl", 96),
]
# not covered: nets/rrc (SSD-style detection: MultiBoxLoss/PriorBox/
# Permute layer types — outside the reference's own rtc_fwd op set too)
# and alexnet_ng_conv_mutated_for_testing (intentionally-broken fixture)


def _first_conv(pipe):
    for op in pipe.topo_order():
        if op.type == "Convolution":
            return op
    raise AssertionError("no conv found")


@pytest.mark.parametrize("name,c1", CASES)
def test_import_reference_prototxt(name, c1):
    from boda_tpu.core.dims import Dims
    from boda_tpu.graph.caffe_io import read_model
    fn = REF_NETS / name / "train_val.prototxt"
    if not fn.exists():
        pytest.skip(f"{fn} missing")
    pipe = read_model(fn, in_dims=Dims.make(img=1, chan=3, y=224, x=224))
    assert len(pipe.ops) > 3
    op = _first_conv(pipe)
    assert op.get_u32("out_chans") == c1
    fl, _by = pipe.total_flops_and_bytes()
    assert fl > 1e8  # shape inference produced a real net


def test_reference_nin_runs_end_to_end():
    """Import the reference NiN prototxt, init deterministic weights, run
    both engines, compare (the BASELINE config #2 shape, synthetic
    weights — the reference's caffemodels are not shipped)."""
    from boda_tpu.core.dims import NDA, Dims
    from boda_tpu.engine.iface import make_engine
    from boda_tpu.graph.caffe_io import read_model
    from boda_tpu.models.zoo import init_pipe_weights
    from boda_tpu.ops.pallas.gen_data import gen_test_nda
    fn = REF_NETS / "nin_imagenet_nopad" / "train_val.prototxt"
    if not fn.exists():
        pytest.skip(f"{fn} missing")
    pipe = read_model(fn, in_dims=Dims.make(img=1, chan=3, y=224, x=224))
    init_pipe_weights(pipe)
    pipe.out_node_name = ""
    d = pipe.get_data_img_dims()
    x = NDA(d, gen_test_nda(d, mode=0, scale=0.05))
    top = pipe.get_single_top_node().name
    e1 = make_engine("ref")
    e1.init(pipe)
    e2 = make_engine("(engine=rtc,fuse=1)")
    e2.init(pipe)
    a = e1.run_fwd({"data": x}, [top])[top].v
    b = e2.run_fwd({"data": x}, [top])[top].v
    scale = np.abs(a).max() + 1e-30
    assert np.abs(a - b).max() / scale < 5e-4


def test_reference_nin_gradient_import():
    """TRAIN-phase import with add_bck_ops: the reference NiN prototxt's
    SoftmaxWithLoss cap is kept and the full backward graph synthesizes
    (the reference's gradient-testing flow, conv_util.cc:718 running
    test case)."""
    from boda_tpu.core.dims import NDA, Dims
    from boda_tpu.engine.iface import make_engine
    from boda_tpu.graph.caffe_io import read_model
    from boda_tpu.models.zoo import init_pipe_weights
    fn = REF_NETS / "nin_imagenet_nopad" / "train_val.prototxt"
    if not fn.exists():
        pytest.skip(f"{fn} missing")
    pipe = read_model(fn, in_dims=Dims.make(img=1, chan=3, y=128, x=128),
                      add_bck_ops=True)
    assert pipe.has_bck_ops
    assert "data_grad_loss" in pipe.nodes
    assert "conv1_filts_grad_loss" in pipe.nodes
    init_pipe_weights(pipe)
    eng = make_engine("ref")
    eng.init(pipe)
    d = pipe.get_data_img_dims()
    ld = pipe.must_get_node(pipe.data_label_node_names[0]).dims
    rng = np.random.RandomState(0)
    feeds = {"data": NDA(d, rng.randn(*d.shape).astype(np.float32) * 0.05),
             pipe.data_label_node_names[0]:
                 NDA(ld, rng.randint(0, 1000, ld.shape).astype(ld.dtype))}
    out = eng.run_fwd(feeds, ["conv1_filts_grad_loss"])
    g = out["conv1_filts_grad_loss"].v
    assert np.isfinite(g).all() and np.abs(g).sum() > 0
