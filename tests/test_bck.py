"""Backward-op synthesis + gradient tests (reference: add_bck_ops
conv_util.cc:732-800; gradient testing = test_compute with add_bck_ops=1
models, test_compute.cc:226-231).

Three layers of checking:
  1. graph structure: add_bck_ops emits the expected BckConv/Spreading/
     ZeroIfNonPos/Split/Reduce ops and grad nodes,
  2. cross-engine: jax-vjp grads (rtc engine) vs independently-derived
     numpy float64 grads (ref engine) within mrd tolerances,
  3. finite differences: ref-engine filts grad vs numerical dloss/dw.
"""

import numpy as np
import pytest

from boda_tpu.core.dims import NDA, Dims
from boda_tpu.engine.iface import make_engine
from boda_tpu.models.zoo import NetBuilder
from boda_tpu.ops.pallas.gen_data import gen_test_nda

MRD_TOLER = 5e-4


def mrd(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = np.maximum(np.abs(a), np.abs(b)).max() + 1e-30
    return np.abs(a - b).max() / scale


def bck_net(batch=2):
    """Small net exercising every bck-supported op type: conv(+relu),
    pool(max), LRN, dropout, concat (multi-consumer node → Reduce+Split),
    capped by SoftmaxWithLoss."""
    b = NetBuilder("bcknet", batch, 3, 16, 16)
    b.conv("conv1", 8, 3, 1, 1)
    b.pool("pool1", 2, 2)
    b.lrn("norm1", 3)
    # norm1 feeds two convs -> partial grads + Reduce
    b.conv("conv2a", 4, 3, 1, 1)
    c2a = b.cur
    b.cur = "norm1"
    b.conv("conv2b", 4, 1)
    c2b = b.cur
    b.concat("cat2", [c2a, c2b])
    b.dropout("drop")
    b.conv("fc", 5, 1, relu=False)
    b.pool("gpool", 0, 1, avg=True, global_=True)
    b.softmax_with_loss("loss")
    pipe = b.done(seed=7)
    pipe.add_bck_ops()
    return pipe


def inputs_for(pipe, batch=2, n_classes=5, seed=3):
    d = pipe.get_data_img_dims()
    rng = np.random.RandomState(seed)
    data = NDA(d, gen_test_nda(d, mode=0, scale=0.1))
    ld = pipe.must_get_node("label").dims
    label = NDA(ld, rng.randint(0, n_classes, size=ld.shape).astype(ld.dtype))
    return {"data": data, "label": label}


GRADS = ["loss", "data_grad_loss", "conv1_filts_grad_loss",
         "conv1_biases_grad_loss", "conv2a_filts_grad_loss",
         "fc_filts_grad_loss", "norm1_grad_loss"]


def test_add_bck_ops_structure():
    pipe = bck_net()
    types = {op.type for op in pipe.ops.values()}
    assert {"BckConv", "Spreading", "ZeroIfNonPos", "Split", "Reduce",
            "BckLRN", "BckDropout"} <= types
    # multi-consumer node norm1: partial grads reduced into norm1_grad_loss
    red = pipe.get_op("reduce_norm1_grad_loss")
    assert set(red.bots) == {"norm1_grad_loss_conv2a", "norm1_grad_loss_conv2b"}
    assert red.tops == ["norm1_grad_loss"]
    # every grad node got dims matching its forward node
    for g in GRADS[1:]:
        fwd = g.split("_grad_loss")[0]
        assert pipe.must_get_node(g).dims == pipe.must_get_node(fwd).dims
    assert pipe.has_bck_ops


def run_engine(spec, pipe, to_get):
    eng = make_engine(spec)
    eng.init(pipe)
    return eng.run_fwd(inputs_for(pipe), list(to_get))


def test_grads_cross_engine():
    pipe = bck_net()
    ref = run_engine("ref", pipe, GRADS)
    rtc = run_engine("(engine=rtc,fuse=0)", pipe, GRADS)
    fused = run_engine("(engine=rtc,fuse=1)", pipe, GRADS)
    for g in GRADS:
        assert ref[g].v.shape == rtc[g].v.shape == fused[g].v.shape
        m = mrd(ref[g].v, rtc[g].v)
        assert m < MRD_TOLER, f"{g}: rtc-vs-ref mrd={m}"
        m = mrd(ref[g].v, fused[g].v)
        assert m < MRD_TOLER, f"{g}: fused-vs-ref mrd={m}"


def test_grads_finite_difference():
    """Independent oracle: perturb single weights, compare dloss/dw against
    the ref engine's analytic filts grad."""
    b = NetBuilder("fd", 1, 2, 8, 8)
    b.conv("conv1", 4, 3, 1, 1)
    b.pool("pool1", 2, 2)
    b.conv("fc", 3, 1, relu=False)
    b.pool("gpool", 0, 1, avg=True, global_=True)
    b.softmax_with_loss("loss")
    pipe = b.done(seed=11)
    pipe.add_bck_ops()
    feeds = inputs_for(pipe, batch=1, n_classes=3)

    def loss_at():
        eng = make_engine("ref")
        eng.init(pipe)
        return float(eng.run_fwd(feeds, ["loss"])["loss"].v.ravel()[0])

    eng = make_engine("ref")
    eng.init(pipe)
    g = eng.run_fwd(feeds, ["conv1_filts_grad_loss"])["conv1_filts_grad_loss"].v
    w = pipe.op_params["conv1_filts"].v
    rng = np.random.RandomState(0)
    eps = 1e-3
    for _ in range(4):
        idx = tuple(rng.randint(0, s) for s in w.shape)
        orig = w[idx]
        w[idx] = orig + eps
        lp = loss_at()
        w[idx] = orig - eps
        lm = loss_at()
        w[idx] = orig
        fd = (lp - lm) / (2 * eps)
        assert abs(fd - g[idx]) < 1e-3 * max(1.0, abs(fd)), \
            f"fd={fd} analytic={g[idx]} at {idx}"


def test_bck_requires_loss_cap():
    from boda_tpu.core.error import RtErr
    b = NetBuilder("nocap", 1, 3, 8, 8)
    b.conv("conv1", 4, 3, 1, 1)
    b.softmax("prob")
    pipe = b.done()
    # error surfaces either as the unhandled plain-Softmax op or as the
    # uncapped-sink check, whichever the walk hits first
    with pytest.raises(RtErr, match="unhandled op type 'Softmax'|"
                                    "not produced by a SoftmaxWithLoss"):
        pipe.add_bck_ops()
