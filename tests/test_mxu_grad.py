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
