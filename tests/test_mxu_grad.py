"""Differentiable mixed-precision conv (ops/mxu_grad.mxu_conv).

Pins: (1) the primal equals the raw template conv; (2) grads exist for
the bf16-operand path (previously: JAX cannot transpose bf16xbf16->f32
convs) and match f32-autodiff reference grads within bf16 tolerance;
(3) the whole fused bf16 training program differentiates and its grads
track the f32 program's."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from boda_tpu.ops.mxu_grad import mxu_conv  # noqa: E402


def _mrd(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)


CASES = [
    # (N, H, W, C, O, k, s, p, lhs_dil)
    (2, 8, 8, 8, 16, 3, 1, 1, None),
    (2, 9, 9, 4, 8, 3, 2, 1, None),
    (1, 16, 16, 3, 16, 7, 2, 3, None),   # resnet stem shape class
    (2, 8, 8, 8, 8, 1, 1, 0, None),      # 1x1
    (2, 5, 5, 4, 6, 3, 1, 2, (2, 2)),    # deconv-style lhs dilation
]


@pytest.mark.parametrize("case", CASES)
def test_mxu_conv_grads_match_f32(case):
    n, h, w_, c, o, k, s, p, ld = case
    rng = np.random.RandomState(0)
    x = rng.randn(n, h, w_, c).astype(np.float32)
    w = rng.randn(k, k, c, o).astype(np.float32) * 0.1
    kw = dict(window_strides=(s, s), padding=((p, p), (p, p)),
              dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if ld:
        kw["lhs_dilation"] = ld

    def loss_mxu(x, w):
        y = mxu_conv(x, w, compute_dtype=jnp.bfloat16, **kw)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size,
                                              dtype=jnp.float32)
                                   .reshape(y.shape)))

    def loss_f32(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, precision=jax.lax.Precision.HIGHEST, **kw)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size,
                                              dtype=jnp.float32)
                                   .reshape(y.shape)))

    _v1, (gx1, gw1) = jax.value_and_grad(loss_mxu, argnums=(0, 1))(x, w)
    _v2, (gx2, gw2) = jax.value_and_grad(loss_f32, argnums=(0, 1))(x, w)
    assert gx1.dtype == jnp.float32 and gw1.dtype == jnp.float32
    # elementwise output parity (the scalar loss cancels and is not a
    # meaningful relative-error target)
    y1 = mxu_conv(x, w, compute_dtype=jnp.bfloat16, **kw)
    y2 = jax.lax.conv_general_dilated(
        x, w, precision=jax.lax.Precision.HIGHEST, **kw)
    assert _mrd(y1, y2) < 2e-2, _mrd(y1, y2)
    assert _mrd(gx1, gx2) < 3e-2, _mrd(gx1, gx2)
    assert _mrd(gw1, gw2) < 3e-2, _mrd(gw1, gw2)


def test_mxu_conv_primal_matches_raw():
    """undifferentiated mxu_conv == the raw bf16 template conv (the
    inference path must be bit-identical)."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 8).astype(np.float32)
    w = rng.randn(3, 3, 8, 16).astype(np.float32)
    kw = dict(window_strides=(1, 1), padding=((1, 1), (1, 1)),
              dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = mxu_conv(x, w, compute_dtype=jnp.bfloat16, **kw)
    want = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bf16_fused_program_differentiates():
    """value_and_grad through the whole bf16 fused-NHWC program (the
    shipped inference config) now works; grads track the f32 program."""
    from boda_tpu.engine.lower import lower_pipe, resolve_plan_weights
    from boda_tpu.engine.rtc_fwd import build_fused_forward
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.cnn_variants import make_op_tune

    pipe = build_model("mini", batch=2)
    rng = np.random.RandomState(0)
    d = pipe.get_data_img_dims()
    x = (rng.randn(*d.shape) * 0.1).astype(np.float32)
    labels = rng.randint(0, 2, size=(d["img"],)).astype(np.int32)

    def make_loss(tune_s, fused):
        plan = lower_pipe(pipe, make_op_tune(tune_s), fused_storage=fused)
        fwd = build_fused_forward(plan)
        weights = resolve_plan_weights(plan, pipe.op_params)

        def loss(w):
            p = fwd({"data": x}, w)["prob"]
            if p.ndim == 4:
                p = p.mean(axis=(2, 3))
            logp = jnp.log(jnp.maximum(p.astype(jnp.float32), 1e-30))
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))
        return loss, weights

    loss_bf, w_bf = make_loss(
        "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0,fuse_siblings=1)", True)
    loss_f32, w_f32 = make_loss("(use_culibs=1)", False)
    vb, gb = jax.jit(jax.value_and_grad(loss_bf))(w_bf)
    vf, gf = jax.jit(jax.value_and_grad(loss_f32))(w_f32)
    assert np.isfinite(float(vb))
    assert abs(float(vb) - float(vf)) < 0.05 * max(abs(float(vf)), 1.0)
    common = sorted(set(gb) & set(gf))
    assert common
    for k in common:
        m = _mrd(gb[k], gf[k])
        assert m < 8e-2, (k, m)


def test_autodiff_matches_add_bck_ops():
    """The two training paths agree: reference-parity backward-op IR
    (graph/pipe.add_bck_ops -> BckConv/... on the ref engine) vs jax
    autodiff of the bf16 fused program via the mxu_grad custom VJP.
    Same net, same weights (seeded builder), same loss semantics
    (sm_grad_and_loss: SUM over images of -log softmax[label])."""
    from boda_tpu.engine.iface import make_engine
    from boda_tpu.engine.lower import lower_pipe, resolve_plan_weights
    from boda_tpu.engine.rtc_fwd import build_fused_forward
    from boda_tpu.models.zoo import NetBuilder
    from boda_tpu.ops.cnn_variants import make_op_tune
    from boda_tpu.core.dims import NDA

    def build(with_loss):
        b = NetBuilder("xnet", 2, 3, 12, 12)
        b.conv("conv1", 8, 3, 1, 1)
        b.pool("pool1", 2, 2)
        b.conv("fc", 4, 1, relu=False)
        b.pool("gpool", 0, 1, avg=True, global_=True)
        if with_loss:
            b.softmax_with_loss("loss")
        return b.done(seed=11)

    rng = np.random.RandomState(3)
    bpipe = build(True)
    bpipe.add_bck_ops()
    d = bpipe.get_data_img_dims()
    x = (rng.randn(*d.shape) * 0.1).astype(np.float32)
    ld = bpipe.must_get_node("label").dims
    label = rng.randint(0, 4, size=ld.shape).astype(ld.dtype)
    eng = make_engine("ref")
    eng.init(bpipe)
    want = eng.run_fwd(
        {"data": NDA(d, x), "label": NDA(ld, label)},
        ["conv1_filts_grad_loss", "fc_filts_grad_loss", "loss"])

    fpipe = build(False)
    plan = lower_pipe(
        fpipe, make_op_tune("(use_culibs=1,prec=bf16,layout=nhwc,s2d=0)"),
        fused_storage=True)
    fwd = build_fused_forward(plan)
    weights = resolve_plan_weights(plan, fpipe.op_params)
    li = jnp.asarray(label.reshape(ld.shape[0]).astype(np.int32))

    def loss_fn(w):
        logits = fwd({"data": x}, w)["gpool"][:, :, 0, 0].astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=1)
        return -jnp.sum(jnp.take_along_axis(logp, li[:, None], axis=1))

    v, g = jax.value_and_grad(loss_fn)(weights)
    assert _mrd(float(v), float(want["loss"].v.reshape(())) if
                want["loss"].v.size == 1 else float(want["loss"].v.sum())) \
        < 3e-2
    assert _mrd(g["conv1_filts"], want["conv1_filts_grad_loss"].v) < 5e-2
    assert _mrd(g["fc_filts"], want["fc_filts_grad_loss"].v) < 5e-2


WGRAD_Q8_CASES = [
    # (N, H, W, I, O, k, s, p)
    (2, 10, 10, 8, 16, 3, 1, 1),
    (2, 11, 13, 8, 16, 3, 2, 1),
    (2, 14, 14, 8, 16, 1, 2, 0),
    (1, 9, 9, 4, 8, 5, 2, 2),
    (2, 8, 8, 8, 8, 1, 1, 0),
]


@pytest.mark.parametrize("case", WGRAD_Q8_CASES)
def test_wgrad_int8_integer_exact(case):
    """The int8 weight-gradient conv (mxu_grad._wgrad_q8) computes the
    same contraction as jax's transpose: on small-integer data the int8
    quantization is EXACT, so the only deltas vs the bf16 VJP are the
    f32 rescale and the shared bf16 output rounding (<=2^-8 relative).
    The input gradient must be bit-identical (same bf16 dgrad path)."""
    n, h, w_, i, o, k, s, p = case
    rng = np.random.RandomState(0)
    x = rng.randint(-7, 8, (n, h, w_, i)).astype(np.float32)
    w = rng.randint(-7, 8, (k, k, i, o)).astype(np.float32)
    oy = (h + 2 * p - k) // s + 1
    ox = (w_ + 2 * p - k) // s + 1
    c = rng.randint(-3, 4, (n, oy, ox, o)).astype(np.float32)

    def loss(q8):
        def f(xx, ww):
            y = mxu_conv(xx, ww, window_strides=(s, s),
                         padding=((p, p), (p, p)),
                         dimension_numbers=("NHWC", "HWIO", "NHWC"),
                         wgrad_int8=q8)
            return (y * c).sum()
        return f

    gx_ref, gw_ref = jax.grad(loss(False), argnums=(0, 1))(x, w)
    gx_q8, gw_q8 = jax.grad(loss(True), argnums=(0, 1))(x, w)
    np.testing.assert_array_equal(np.asarray(gx_q8), np.asarray(gx_ref))
    assert _mrd(gw_q8, gw_ref) < 1e-2, _mrd(gw_q8, gw_ref)


def test_wgrad_int8_float_tolerance():
    """Random float data: per-tensor activation + per-out-channel
    cotangent scales keep the int8 dW within ~2% max-relative of the
    bf16 dW (measured 1.3-1.4%; the budget a momentum-SGD step
    tolerates — the accuracy claim itself is gated by training,
    test_quant8 trained-weights gates)."""
    rng = np.random.RandomState(0)
    x = np.abs(rng.randn(4, 14, 14, 32)).astype(np.float32)
    w = (rng.randn(3, 3, 32, 64) * 0.1).astype(np.float32)
    c = rng.randn(4, 14, 14, 64).astype(np.float32)

    def loss(q8):
        def f(xx, ww):
            y = mxu_conv(xx, ww, window_strides=(1, 1),
                         padding=((1, 1), (1, 1)),
                         dimension_numbers=("NHWC", "HWIO", "NHWC"),
                         wgrad_int8=q8)
            return (y * c).sum()
        return f

    gw_ref = jax.grad(loss(False), argnums=1)(x, w)
    gw_q8 = jax.grad(loss(True), argnums=1)(x, w)
    a = np.asarray(gw_q8, np.float64)
    b = np.asarray(gw_ref, np.float64)
    assert _mrd(a, b) < 2e-2, _mrd(a, b)
    cos = np.vdot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos


def test_grad_q8_knob_lowers_int8_wgrad():
    """OpTune grad_q8 flows tune -> annotation -> sig -> template ->
    mxu_conv: the training jaxpr contains an int8 conv (the wgrad), the
    forward program is unchanged (bit-identical primal), and grads track
    the bf16 path."""
    from boda_tpu.engine.lower import lower_pipe, resolve_plan_weights
    from boda_tpu.engine.rtc_fwd import build_fused_forward
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.cnn_variants import make_op_tune

    pipe = build_model("mini", batch=2)
    base = "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0)"
    q8 = make_op_tune(base[:-1] + ",grad_q8=1)")
    sites = {op.tag: q8 for op in pipe.ops.values()
             if op.type == "Convolution"
             and op.get_dims("filts")["in_chan"] >= 16}
    assert sites, "mini net must have a grad_q8-eligible conv"

    def make(op_tunes):
        plan = lower_pipe(pipe, make_op_tune(base), op_tunes=op_tunes,
                          fused_storage=True)
        if op_tunes:
            assert any(s.sig.get_u32_or("grad_q8", 0) for s in plan.steps)
        fwd = build_fused_forward(plan)
        w = resolve_plan_weights(plan, pipe.op_params)
        return fwd, w

    rng = np.random.RandomState(0)
    d = pipe.get_data_img_dims()
    x = (rng.randn(*d.shape) * 0.1).astype(np.float32)
    labels = jnp.asarray(rng.randint(0, 8, size=(d["img"],)), jnp.int32)

    def loss_of(fwd):
        def loss(w):
            p = fwd({"data": x}, w)["prob"]
            if p.ndim == 4:
                p = p.mean(axis=(2, 3))
            logp = jnp.log(jnp.maximum(p.astype(jnp.float32), 1e-30))
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))
        return loss

    fwd_q, w_q = make(sites)
    fwd_b, w_b = make(None)
    # forward program unchanged: grad_q8 is backward-only
    np.testing.assert_array_equal(
        np.asarray(fwd_q({"data": x}, w_q)["prob"]),
        np.asarray(fwd_b({"data": x}, w_b)["prob"]))
    jaxpr_q = str(jax.make_jaxpr(jax.grad(loss_of(fwd_q)))(w_q))
    jaxpr_b = str(jax.make_jaxpr(jax.grad(loss_of(fwd_b)))(w_b))
    assert "i8[" in jaxpr_q, "grad jaxpr must carry the int8 wgrad conv"
    assert "i8[" not in jaxpr_b
    g_q = jax.grad(loss_of(fwd_q))(w_q)
    g_b = jax.grad(loss_of(fwd_b))(w_b)
    for k in g_b:
        assert _mrd(g_q[k], g_b[k]) < 6e-2, (k, _mrd(g_q[k], g_b[k]))


def test_grad_q8_survives_sibling_fusion():
    """xla_conv2 (fused sibling pair): grad_q8 set on ALL members
    propagates to the fused sig and the fused training jaxpr carries the
    int8 wgrad conv."""
    from boda_tpu.engine.lower import lower_pipe, resolve_plan_weights
    from boda_tpu.engine.rtc_fwd import build_fused_forward
    from boda_tpu.models.zoo import NetBuilder
    from boda_tpu.ops.cnn_variants import make_op_tune

    b = NetBuilder("sibnet", 2, 16, 8, 8)
    b.conv("a", 16, 1, relu=True)
    b.conv("b", 16, 1, relu=False, in_node="data")
    b.eltwise("add", ["a", "b"])
    pipe = b.done(seed=5)
    base = "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0,fuse_siblings=1)"
    q8 = make_op_tune(base[:-1] + ",grad_q8=1)")
    plan = lower_pipe(pipe, make_op_tune(base),
                      op_tunes={"a": q8, "b": q8}, fused_storage=True)
    fused = [s for s in plan.steps if s.func_name == "xla_conv2"]
    assert fused and fused[0].sig.get_u32_or("grad_q8", 0) == 1
    fwd = build_fused_forward(plan)
    w = resolve_plan_weights(plan, pipe.op_params)
    x = np.random.RandomState(0).randn(2, 16, 8, 8).astype(np.float32)

    def loss(w):
        return fwd({"data": x}, w)["add"].astype(jnp.float32).sum()

    assert "i8[" in str(jax.make_jaxpr(jax.grad(loss))(w))
    g = jax.grad(loss)(w)
    assert all(np.isfinite(np.asarray(v, np.float32)).all()
               for v in g.values())


def test_training_reduces_loss():
    """End-to-end: a few SGD steps through the bf16 fused program
    overfit a fixed batch — loss must strictly decrease."""
    from boda_tpu.engine.lower import lower_pipe, resolve_plan_weights
    from boda_tpu.engine.rtc_fwd import build_fused_forward
    from boda_tpu.models.zoo import build_model
    from boda_tpu.ops.cnn_variants import make_op_tune

    pipe = build_model("mini", batch=4)
    plan = lower_pipe(
        pipe, make_op_tune("(use_culibs=1,prec=bf16,layout=nhwc,s2d=0)"),
        fused_storage=True)
    fwd = build_fused_forward(plan)
    w = resolve_plan_weights(plan, pipe.op_params)
    rng = np.random.RandomState(0)
    d = pipe.get_data_img_dims()
    x = (rng.randn(*d.shape) * 0.1).astype(np.float32)
    labels = jnp.asarray(rng.randint(0, 8, size=(d["img"],)), jnp.int32)

    @jax.jit
    def step(w):
        def loss_fn(w):
            p = fwd({"data": x}, w)["prob"]
            if p.ndim == 4:
                p = p.mean(axis=(2, 3))
            logp = jnp.log(jnp.maximum(p.astype(jnp.float32), 1e-30))
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))
        loss, g = jax.value_and_grad(loss_fn)(w)
        return loss, jax.tree_util.tree_map(
            lambda wv, gv: wv - 0.1 * gv.astype(wv.dtype), w, g)

    losses = []
    for _ in range(8):
        loss, w = step(w)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses
