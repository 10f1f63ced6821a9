"""int8 conv execution path (OpTune quant8=1): dynamic per-tensor
activation + per-out_chan weight quantization inside each conv.
Reference role: the fixed-point quantize hooks (rtc_fwd.cc:28-37)
extended to actual int8 MXU execution."""

import numpy as np
import pytest

from boda_tpu.engine.lower import lower_pipe, resolve_plan_weights
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
    def run(tune_s, fused):
        plan = lower_pipe(pipe, make_op_tune(tune_s), fused_storage=fused)
        fwd = build_fused_forward(plan)
        weights = resolve_plan_weights(plan, pipe.op_params)
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


def test_selective_quant8_3x3_top1_agrees():
    """The shipped headline config (r3): int8 on the 3x3 convs only
    (branch2b sites — K=9C contractions quantize well and run faster on
    the MXU; 1x1s and the thin-channel stem stay float). Measured on-chip:
    8.73 -> 8.01 ms (57.5% -> 62.6% roofline). Accuracy pinned here."""
    # micro net with wide-enough 3x3 convs to pass the quant8 channel gate
    from boda_tpu.models.zoo import NetBuilder
    b = NetBuilder("q3net", 2, 3, 32, 32)
    b.conv("conv1", 16, 5, 2, 2).pool("pool1", 3, 2)
    b.conv("c2", 32, 3, 1, 1)
    b.conv("c3", 32, 3, 1, 1)
    b.conv("head", 10, 1, relu=False)
    b.pool("gp", 0, 1, avg=True, global_=True)
    b.softmax("prob")
    pipe = b.done(seed=9)
    d = pipe.get_data_img_dims()
    x = (np.random.RandomState(3).randn(*d.shape) * 0.3).astype(np.float32)
    base = "(use_culibs=1,prec=bf16,layout=nhwc)"
    q3 = make_op_tune(base[:-1] + ",quant8=1)")
    from boda_tpu.core.geom import Pt
    op_tunes = {op.tag: q3 for op in pipe.ops.values()
                if op.type == "Convolution" and op.kern_sz() == Pt(3, 3)
                and op.tag != "conv1"}
    assert op_tunes, "micro-resnet has 3x3 convs"
    def run(op_t):
        plan = lower_pipe(pipe, make_op_tune(base), op_tunes=op_t,
                          fused_storage=True)
        fwd = build_fused_forward(plan)
        weights = resolve_plan_weights(plan, pipe.op_params)
        return np.asarray(fwd({"data": x}, weights)["prob"]), plan

    pf, _ = run(None)
    pq, plan_q = run(op_tunes)
    nq = sum(s.sig.get_u32_or("quant8", 0) == 1 for s in plan_q.steps)
    assert nq == len(op_tunes)
    assert pf.shape == pq.shape
    assert (pf.reshape(pf.shape[0], -1).argmax(1)
            == pq.reshape(pq.shape[0], -1).argmax(1)).all()
    mrd = np.abs(pf - pq).max() / (np.abs(pf).max() + 1e-9)
    assert mrd < 0.05, mrd


def test_resnet_int8_preset_top1_agrees():
    """The shipped bench variant: tune/presets.resnet_int8_site_tunes
    (stage-3 3x3s + all stage-4/5 convs int8). Pin site count and top-1
    agreement vs bf16 on real resnet-50 topology (tiny spatial)."""
    from boda_tpu.models.zoo import build_model
    from boda_tpu.tune.presets import resnet_int8_site_tunes
    pipe = build_model("resnet-50", batch=2, ysz=64, xsz=64)
    base = "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0)"
    tunes = resnet_int8_site_tunes(pipe, base)
    # 4 s3 3x3s... resnet-50: s3 has 4 blocks -> 4 branch2b; s4 6 blocks
    # * 3 convs + 1 projection = 19; s5 3 * 3 + 1 = 10  => 4 + 29 = 33... 
    # count from the graph itself:
    import re
    want = [op.tag for op in pipe.ops.values()
            if op.type == "Convolution"
            and (re.fullmatch(r"res3[a-z]_branch2b", op.tag)
                 or re.fullmatch(r"res[45][a-z]_branch.*", op.tag))]
    assert sorted(tunes) == sorted(want)
    assert len(tunes) == 33  # 4 s3-3x3 + 19 s4 + 10 s5 convs
    d = pipe.get_data_img_dims()
    x = (np.random.RandomState(3).randn(*d.shape) * 0.3).astype(np.float32)
    def run(op_t):
        plan = lower_pipe(pipe, make_op_tune(base), op_tunes=op_t,
                          fused_storage=True)
        fwd = build_fused_forward(plan)
        weights = resolve_plan_weights(plan, pipe.op_params)
        return np.asarray(fwd({"data": x}, weights)["prob"]), plan

    pf, _ = run(None)
    pq, plan_q = run(tunes)
    nq = sum(s.sig.get_u32_or("quant8", 0) == 1 for s in plan_q.steps)
    assert nq == len(tunes)
    assert (pf.reshape(2, -1).argmax(1) == pq.reshape(2, -1).argmax(1)).all()


def test_resnet_grad_q8_preset_sites_and_training():
    """The training-side preset (tune/presets.resnet_grad_q8_site_tunes,
    r5 probe winners: s3-5 3x3s + s5 1x1->2048 expansions): pin the site
    set, that the FORWARD program is bit-identical to the bf16 plan, and
    that the training jaxpr carries the int8 wgrad conv."""
    import re

    import jax
    import jax.numpy as jnp

    from boda_tpu.models.zoo import build_model
    from boda_tpu.tune.presets import resnet_grad_q8_site_tunes
    pipe = build_model("resnet-50", batch=2, ysz=64, xsz=64)
    base = "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0)"
    tunes = resnet_grad_q8_site_tunes(pipe, base)
    want = [op.tag for op in pipe.ops.values()
            if op.type == "Convolution"
            and (re.fullmatch(r"res[345][a-z]_branch2b", op.tag)
                 or re.fullmatch(r"res5[a-z]_branch2c", op.tag))]
    assert sorted(tunes) == sorted(want)
    assert len(tunes) == 16  # 13 branch2b (4+6+3) + 3 s5 branch2c

    d = pipe.get_data_img_dims()
    x = (np.random.RandomState(3).randn(*d.shape) * 0.3).astype(np.float32)

    def run(op_t):
        plan = lower_pipe(pipe, make_op_tune(base), op_tunes=op_t,
                          fused_storage=True)
        fwd = build_fused_forward(plan)
        weights = resolve_plan_weights(plan, pipe.op_params)
        return plan, fwd, weights

    plan_q, fwd_q, w_q = run(tunes)
    _plan_b, fwd_b, w_b = run(None)
    nq = sum(s.sig.get_u32_or("grad_q8", 0) == 1 for s in plan_q.steps)
    assert nq == len(tunes)
    np.testing.assert_array_equal(
        np.asarray(fwd_q({"data": x}, w_q)["prob"]),
        np.asarray(fwd_b({"data": x}, w_b)["prob"]))

    def loss(w):
        return fwd_q({"data": x}, w)["prob"].astype(jnp.float32).sum()

    assert "i8[" in str(jax.make_jaxpr(jax.grad(loss))(w_q))


def test_calibrated_static_int8_matches_dynamic():
    """static (calibrated act_scale) int8 must track dynamic int8 closely
    when calibrated on the same input, and keep top-1 agreement with
    bf16 — the production int8 shape (no per-call max reduction)."""
    from boda_tpu.models.zoo import build_model
    from boda_tpu.tune.presets import (calibrate_int8_act_scales,
                                       resnet_int8_site_tunes)
    pipe = build_model("resnet-50", batch=2, ysz=64, xsz=64)
    base = "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0)"
    dyn = resnet_int8_site_tunes(pipe, base)
    d = pipe.get_data_img_dims()
    x = (np.random.RandomState(3).randn(*d.shape) * 0.3).astype(np.float32)
    stat = calibrate_int8_act_scales(pipe, base, x, dyn)
    assert all(t.act_scale > 0 for t in stat.values())
    def run(op_t):
        plan = lower_pipe(pipe, make_op_tune(base), op_tunes=op_t,
                          fused_storage=True)
        if op_t is stat:
            assert any("act_scale" in s.sig.nda_vals for s in plan.steps)
        fwd = build_fused_forward(plan, keep_all_nodes=True)
        weights = resolve_plan_weights(plan, pipe.op_params)
        return np.asarray(fwd({"data": x}, weights)["fc1000-conv"])

    def mrd(a, b):
        return np.abs(a - b).max() / (np.maximum(np.abs(a), np.abs(b)).max()
                                      + 1e-30)

    # compare pre-softmax logits: this untrained msra net has |logits|~1e3
    # with near-ties, so post-softmax comparisons are argmax lotteries.
    # static-vs-dynamic differ only through downstream drift of the
    # per-site scale choice; both must stay close to each other and to
    # the bf16 float path.
    lf = run(None)
    ld = run(dyn)
    ls = run(stat)
    assert mrd(ld, ls) < 5e-2
    assert mrd(lf, ls) < 1e-1 and mrd(lf, ld) < 1e-1


def test_act_scale_artifacts_load():
    """shipped calibration artifacts parse and apply onto site tunes."""
    from pathlib import Path

    from boda_tpu.models.zoo import build_model
    from boda_tpu.tune.presets import (load_act_scales,
                                       resnet_int8_site_tunes)
    data = Path(__file__).parent / "data"
    pipe = build_model("resnet-50", batch=128)
    site = resnet_int8_site_tunes(
        pipe, "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0,fuse_siblings=1)")
    stat = load_act_scales(data / "resnet50-b128-int8-scales.lexp", site)
    assert len(stat) == 33
    assert all(t.act_scale > 0 for t in stat.values())
    # the other artifacts at least parse
    for fn in ("resnet101-b64-int8-scales.lexp",
               "resnet152-b64-int8-scales.lexp", "vgg19-b64-int8-scales.lexp",
               "vgg16-b64-int8-scales.lexp"):
        got = load_act_scales(data / fn, {})
        assert got == {}


def test_fused_siblings_carry_act_scale():
    """regression (r3 review): the sibling-fusion pass must propagate
    calibrated act_scale into the fused xla_conv2 sigs — 4 of 33 shipped
    sites are projection pairs and silently fell back to dynamic."""
    from pathlib import Path

    from boda_tpu.models.zoo import build_model
    from boda_tpu.tune.presets import load_act_scales, resnet_int8_site_tunes
    tune_s = "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0,fuse_siblings=1)"
    pipe = build_model("resnet-50", batch=128)
    site = resnet_int8_site_tunes(pipe, tune_s)
    stat = load_act_scales(Path(__file__).parent / "data"
                           / "resnet50-b128-int8-scales.lexp", site)
    plan = lower_pipe(pipe, make_op_tune(tune_s), op_tunes=stat,
                      fused_storage=True)
    q_fused = [s for s in plan.steps if s.func_name == "xla_conv2"
               and s.sig.get_u32_or("quant8", 0)]
    assert q_fused, "expected quantized fused projection pairs (res4a/res5a)"
    assert all("act_scale" in s.sig.nda_vals for s in q_fused)
    # and every single-conv quant8 step carries one too
    q_single = [s for s in plan.steps if s.func_name == "xla_conv"
                and s.sig.get_u32_or("quant8", 0)]
    assert q_single and all("act_scale" in s.sig.nda_vals for s in q_single)


@pytest.mark.parametrize("model,pats,sz", [
    # googlenet/alexnet are the two heaviest tests in the suite (~35s/29s):
    # slow-gated; nin keeps the shipped-site-set validation in the default
    # loop (VERDICT r3 #8)
    pytest.param("googlenet_conv", r"inception_.*/[35]x[35]", 128,
                 marks=pytest.mark.slow),
    ("nin_imagenet", r"conv2|conv3|conv4-1024", 128),
    # alexnet's fc6-conv needs the full 227 input (6x6 kernel after pools)
    pytest.param("alexnet_ng_conv", r"conv[2-5]|fc[67]-conv", 227,
                 marks=pytest.mark.slow),
])
def test_shipped_static_int8_site_sets_track_float(model, pats, sz):
    """The session-8 shipped static-int8 configs (googlenet 4.09 ms /
    nin 1.34 ms / alexnet 3.57 ms, docs/PERF.md) must track the float
    path on their exact site sets — same validation shape as the
    resnet test above, calibrated inline at test size."""
    import re
    from boda_tpu.models.zoo import build_model
    from boda_tpu.tune.presets import calibrate_int8_act_scales
    pipe = build_model(model, batch=2, ysz=sz, xsz=sz)
    base = "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0)"
    q = make_op_tune(base[:-1] + ",quant8=1)")
    rxs = [re.compile(p) for p in pats.split(";")]
    site = {op.tag: q for op in pipe.ops.values()
            if op.type == "Convolution"
            and any(r.fullmatch(op.tag) for r in rxs)}
    assert site, f"no sites matched for {model}"
    d = pipe.get_data_img_dims()
    x = (np.random.RandomState(5).randn(*d.shape) * 0.3).astype(np.float32)
    stat = calibrate_int8_act_scales(pipe, base, x, site)
    top = [n for n in pipe.nodes
           if pipe.nodes[n].top_for and n.endswith("prob")] or \
          [pipe.get_single_top_node().name]
    def run(op_t):
        plan = lower_pipe(pipe, make_op_tune(base), op_tunes=op_t,
                          fused_storage=True)
        fwd = build_fused_forward(plan, keep_all_nodes=True)
        weights = resolve_plan_weights(plan, pipe.op_params)
        outs = fwd({"data": x}, weights)
        # compare the logits feeding the softmax (see resnet note above)
        logits = [n for n in outs if "classifier" in n or n.startswith("fc")
                  or n.startswith("cccp8")]
        return np.asarray(outs[logits[0] if logits else top[0]])

    def mrd(a, b):
        return np.abs(a - b).max() / (np.maximum(np.abs(a), np.abs(b)).max()
                                      + 1e-30)

    lf = run(None)
    ls = run(stat)
    assert mrd(lf, ls) < 1e-1
    # int8 really ran: outputs must differ from float beyond fp noise
    assert mrd(lf, ls) > 1e-6


_TRAINED = "resnet50-shapes40.boda"
_TRAINED_SCALES = "resnet50-shapes40-int8-scales.lexp"
# the shipped int8 preset as op_tunes_pat (tune/presets.resnet_int8_site_tunes
# site set, spelled as tag regexes so the CLI config carries it)
_INT8_PAT = ("(res3[a-z0-9]*_branch2b=(use_culibs=1,prec=bf16,layout=nhwc,"
             "s2d=0,fuse_siblings=1,quant8=1),res[45][a-z0-9]*_branch.*="
             "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0,fuse_siblings=1,"
             "quant8=1))")


def _trained_gate(num_imgs, batch, b_extra=""):
    """Run the bf16-vs-int8 cls_agree gate on the TRAINED resnet-50
    (40-class shapes, 94.5% val top-1) at native 224^2 resolution, with
    the act scales calibrated on the trained weights. Returns the parsed
    stats dict. Held-out images: start_ix=100000 (training used 0..16k).
    b_extra: extra BASE-tune knobs for engine b (e.g. ',q8_edges=1')."""
    import io as _io
    import re
    from contextlib import redirect_stdout
    from pathlib import Path

    from boda_tpu.core.has_main import create_and_run_has_main
    data = Path(__file__).parent / "data"
    base = "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0,fuse_siblings=1)"
    base_b = base[:-1] + b_extra + ")" if b_extra else base
    buf = _io.StringIO()
    with redirect_stdout(buf):
        create_and_run_has_main(
            f"(mode=cls_agree,model=resnet-50,model_opts=(num_classes=40),"
            f"batch={batch},weights_fn={data / _TRAINED},"
            f"src=(mode=shapes-src,num_imgs={num_imgs},start_ix=100000,"
            f"ysz=224,xsz=224,num_classes=40,seed=1,mean=128,"
            f"scale=0.015625),"
            f"conv_fwd=(engine=rtc,op_tune={base}),"
            f"conv_fwd_b=(engine=rtc,op_tune={base_b},"
            f"op_tunes_pat={_INT8_PAT},"
            f"act_scales_fn={data / _TRAINED_SCALES}))", {})
    out = buf.getvalue()
    stats = dict(re.findall(r"(\w+)=([0-9.]+)", out))
    assert "top_1_acc_a" in stats, out
    return {k: float(v) for k, v in stats.items()}


def test_int8_preset_top5_on_trained_weights():
    """VERDICT r3 missing #1 / next-round #1: the int8 preset's accuracy
    gate on REAL TRAINED weights at native resolution (not synthetic
    crc32 weights at 64^2). The checked-in snapshot was trained by
    cnet_train (SGD+momentum, fixup init, grad clipping) to 94.5% val
    top-1 on the 40-class shapes set; act scales were re-calibrated on
    the trained weights (scripts/calibrate_int8.py). Full 640-image
    on-chip run (2026-08-19): bf16 94.53% / int8 94.84% top-1,
    top-1 agreement 99.69%, int8-top1 in bf16-top5 100%, top-5 overlap
    98.5%. Default loop: one held-out batch; BODA_RUN_SLOW covers 64.
    Reference bar: ground-truth digest comparison on real model runs
    (test_compute.cc:267-269, comp_util.H:13)."""
    s = _trained_gate(num_imgs=8, batch=8)
    assert s["num_test"] == 8
    # both engines classify held-out data well (chance = 2.5%)
    assert s["top_1_acc_a"] >= 0.75 and s["top_1_acc_b"] >= 0.75, s
    # int8 does not lose accuracy (gate: delta >= -1 image)
    assert s["num_pos_b"] >= s["num_pos_a"] - 1, s
    # top-5 containment: every int8 top-1 is in the bf16 top-5
    assert s["b_top1_in_a_top5"] == 1.0, s
    assert s["top_1_agree"] >= 0.875, s


@pytest.mark.slow
def test_int8_preset_top5_on_trained_weights_64imgs():
    """The 64-image version of the trained-weights gate (pre-ship loop);
    thresholds set from the 640-image on-chip run (see above)."""
    s = _trained_gate(num_imgs=64, batch=8)
    assert s["num_test"] == 64
    assert s["top_1_acc_a"] >= 0.90 and s["top_1_acc_b"] >= 0.90, s
    # val-accuracy delta: int8 within 1 image of bf16 over 64
    assert s["num_pos_b"] >= s["num_pos_a"] - 1, s
    assert s["b_top1_in_a_top5"] >= 0.98, s
    assert s["top_1_agree"] >= 0.97, s
    assert s["top_5_overlap"] >= 0.95, s


def test_q8_edges_pass_flips_and_guards():
    """int8 storage edges (engine/lower._apply_int8_edges): a node whose
    only reader is a static-scale prequant int8 conv flips (producer
    out_q8 + reader in_q8); dynamic-scale readers and plan outputs must
    NOT flip. (TPU-native extension of the reference's per-layer quantize
    hook point, rtc_fwd.cc:28-37.)"""
    from boda_tpu.models.zoo import build_model
    from boda_tpu.tune.presets import calibrate_int8_act_scales
    base = "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0)"
    baseq = base[:-1] + ",q8_edges=1)"
    pipe = build_model("mini", batch=2)
    x = (np.random.RandomState(0).randn(2, 3, 32, 32) * 40) \
        .astype(np.float32)
    q = make_op_tune(base[:-1] + ",quant8=1)")
    # static reader: conv1 -> cccp1 flips
    tunes = calibrate_int8_act_scales(pipe, base, x, {"cccp1": q})
    plan = lower_pipe(pipe, make_op_tune(baseq), op_tunes=tunes,
                      fused_storage=True)
    bits = {s.call_tag: (s.sig.get_u32_or("out_q8", 0),
                         s.sig.get_u32_or("in_q8", 0))
            for s in plan.steps}
    assert bits["conv1"] == (1, 0) and bits["cccp1"] == (0, 1), bits
    assert float(next(s for s in plan.steps if s.call_tag == "conv1")
                 .sig.nda_vals["out_scale"].item()) \
        == tunes["cccp1"].act_scale
    # DYNAMIC reader (no act_scale): nothing flips
    plan_dyn = lower_pipe(pipe, make_op_tune(baseq), op_tunes={"cccp1": q},
                          fused_storage=True)
    assert not any(s.sig.get_u32_or("out_q8", 0) for s in plan_dyn.steps)
    # numeric agreement: the flipped program matches the unflipped one
    # (same quantization arithmetic applied at the producer; elements at
    # a rounding boundary may move by one int8 code)
    import jax
    plan0 = lower_pipe(pipe, make_op_tune(base), op_tunes=tunes,
                       fused_storage=True)
    f0, f1 = build_fused_forward(plan0), build_fused_forward(plan)
    w0 = resolve_plan_weights(plan0, pipe.op_params)
    w1 = resolve_plan_weights(plan, pipe.op_params)
    p0 = np.asarray(jax.jit(lambda a, w: f0({"data": a}, w)["prob"])(x, w0))
    p1 = np.asarray(jax.jit(lambda a, w: f1({"data": a}, w)["prob"])(x, w1))
    assert np.abs(p0 - p1).max() <= 0.02, np.abs(p0 - p1).max()


def test_q8_edges_trained_weights_agreement():
    """The q8_edges program on the TRAINED resnet-50 at 224^2 must keep
    the int8 preset's accuracy story (measured 2026-08-19, 16 imgs CPU:
    top-1 agreement 1.0, top-5 overlap 1.0, identical accuracy)."""
    s = _trained_gate(num_imgs=8, batch=8, b_extra=",q8_edges=1")
    assert s["num_test"] == 8
    assert s["top_1_acc_a"] >= 0.75 and s["top_1_acc_b"] >= 0.75, s
    assert s["num_pos_b"] >= s["num_pos_a"] - 1, s
    assert s["b_top1_in_a_top5"] == 1.0, s
    assert s["top_1_agree"] >= 0.875, s


def test_prequant_weights_match_in_program_quant():
    """The weight-prequantization pass (engine/lower.py) must be
    numerically equivalent to in-program weight quantization: same
    per-out_chan scale formula (f32 ops, half-even rounding), hoisted to
    init. Compared through the full lowered path (prequant, plan carries
    derived int8 weight + scale nodes) vs the standalone template
    (in-fn quant)."""
    from boda_tpu.models.zoo import NetBuilder
    b = NetBuilder("pq", 2, 16, 16, 16)
    b.conv("c1", 32, 3, 1, 1)
    b.conv("head", 8, 1, relu=False)
    b.softmax("prob")
    pipe = b.done(seed=11)
    base = "(use_culibs=1)"
    q = make_op_tune(base[:-1] + ",quant8=1)")
    plan = lower_pipe(pipe, make_op_tune(base), op_tunes={"c1": q})
    qsteps = [s for s in plan.steps if s.sig.get_u32_or("quant8", 0)]
    assert len(qsteps) == 1
    s = qsteps[0]
    assert s.sig.get_u32_or("prequant_w", 0) == 1
    assert s.arg_nodes["filts"].endswith("__q8")
    assert plan.node_dims[s.arg_nodes["filts"]].tn == "int8_t"
    assert "c1_filts" not in plan.weight_nodes  # source dropped, derived in
    assert "c1_filts__q8" in plan.weight_nodes
    weights = resolve_plan_weights(plan, pipe.op_params)
    assert weights["c1_filts__q8"].dtype == np.int8
    fwd = build_fused_forward(plan, keep_all_nodes=True)
    d = pipe.get_data_img_dims()
    x = (np.random.RandomState(7).randn(*d.shape) * 0.3).astype(np.float32)
    got = np.asarray(fwd({"data": x}, weights)["c1"])
    # in-fn quant on the standalone template (no prequant)
    from boda_tpu.ops.pallas.conv import make_conv_op
    op = make_conv_op(2, 16, 16, 16, 32, 3, 3, py=1, px=1, relu=True)
    op.set_u32("quant8", 1)
    t = get_template("xla_conv")
    fn = t.build(t.check_args(op))
    want = np.asarray(fn(x, pipe.op_params["c1_filts"].v,
                         pipe.op_params["c1_biases"].v))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # feeding a float-plan weights dict to a prequant plan must ERROR,
    # not zero-fill the missing derived weights
    from boda_tpu.core.error import RtErr
    wf = {n: pipe.op_params[n].v for n in pipe.op_params}
    wf.pop("c1_filts")
    with pytest.raises(RtErr, match="missing from the weights dict"):
        fwd({"data": x}, {k: v for k, v in wf.items()
                          if not k.startswith("c1_filts")})


def test_grad_q8_on_innerproduct_is_loud():
    """grad_q8 on an InnerProduct site must ERROR, not silently run the
    bf16 VJP (the IP lowering's NCHW xla_conv form keeps the bf16
    backward — a quiet no-op would make an fc int8-wgrad A/B measure
    the wrong configuration). fc layers train with int8 wgrad via
    fc-as-conv nets (*_ng_conv)."""
    import pytest

    from boda_tpu.core.error import RtErr
    from boda_tpu.graph.caffe_io import create_pipe_from_param
    from boda_tpu.graph.pbtext import parse_pbtext
    from tests.test_caffe_io import V2_PROTOTXT
    pipe = create_pipe_from_param(parse_pbtext(V2_PROTOTXT))
    pipe.calc_dims()
    t = make_op_tune("(use_culibs=1,prec=bf16,grad_q8=1)")
    with pytest.raises(RtErr, match="grad_q8.*InnerProduct"):
        lower_pipe(pipe, t)
