"""Lowering-independent whole-net check (VERDICT r2 weak #7): ref_fwd
shares lower_pipe with the device engine, so a lowering bug (fusion
ordering, concat offsets, in-place handling) would hit both engines
identically and digest comparisons couldn't catch it. This test computes
a small net's forward by DIRECT hand composition of numpy ops from the
graph alone — no lower_pipe, no Steps, no templates — and pins both
engines against it. (The reference's caffe_fwd shared nothing above the
pipe IR; this is the same independence, hand-rolled.)"""

import numpy as np

from boda_tpu.core.dims import NDA
from boda_tpu.engine.iface import make_engine
from boda_tpu.models.zoo import NetBuilder
from boda_tpu.ops.pallas.gen_data import gen_test_nda


def _net(batch=2):
    b = NetBuilder("hand", batch, 3, 16, 16)
    b.conv("conv1", 8, 3, 2, 1)          # + relu
    b.pool("pool1", 2, 2)
    c1 = b.cur
    b.conv("a", 4, 1)                    # + relu
    ca = b.cur
    b.cur = c1
    b.conv("b", 4, 1)                    # + relu
    cb = b.cur
    b.concat("cat", [ca, cb])
    b.conv("head", 5, 1, relu=False)
    b.softmax("prob")
    return b.done(seed=21)


def _conv(x, w, bias, stride, pad, relu):
    n, C, H, W = x.shape
    oc, ic, ky, kx = w.shape
    oy = (H + 2 * pad - ky) // stride + 1
    ox = (W + 2 * pad - kx) // stride + 1
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    out = np.zeros((n, oc, oy, ox))
    for yy in range(ky):
        for xx in range(kx):
            win = xp[:, :, yy:yy + oy * stride:stride,
                     xx:xx + ox * stride:stride][:, :, :oy, :ox]
            out += np.einsum("nihw,oi->nohw", win, w[:, :, yy, xx])
    out += bias[None, :, None, None]
    return np.maximum(out, 0) if relu else out


def test_engines_match_handrolled_forward():
    pipe = _net()
    d = pipe.get_data_img_dims()
    x = np.asarray(gen_test_nda(d, 0, 0.1), np.float64)
    P = {k: np.asarray(v.v, np.float64) for k, v in pipe.op_params.items()}

    # hand composition straight from the builder spec above
    h = _conv(x, P["conv1_filts"], P["conv1_biases"], 2, 1, True)
    # max pool 2x2 s2 (8x8 -> 4x4)
    n, c, H, W = h.shape
    hp = h.reshape(n, c, H // 2, 2, W // 2, 2).max(axis=(3, 5))
    a = _conv(hp, P["a_filts"], P["a_biases"], 1, 0, True)
    bb = _conv(hp, P["b_filts"], P["b_biases"], 1, 0, True)
    cat = np.concatenate([a, bb], axis=1)
    head = _conv(cat, P["head_filts"], P["head_biases"], 1, 0, False)
    e = np.exp(head - head.max(axis=1, keepdims=True))
    want = e / e.sum(axis=1, keepdims=True)

    for spec in ("ref", "(engine=rtc,fuse=1)", "(engine=rtc,fuse=0)"):
        eng = make_engine(spec)
        eng.init(pipe)
        got = eng.run_fwd({"data": NDA(d, x.astype(np.float32))},
                          ["prob"])["prob"].v
        mrd = np.abs(got - want).max() / (np.abs(want).max() + 1e-30)
        assert mrd < 5e-4, f"{spec}: mrd={mrd}"
