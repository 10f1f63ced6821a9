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
    from boda_tpu.engine.lower import lower_pipe
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
        weights = {n: pipe.op_params[n].v for n in plan.weight_nodes}

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
