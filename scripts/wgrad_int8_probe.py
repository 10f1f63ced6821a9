"""int8 weight-gradient floors (VERDICT r4 #1): can the int8 MXU beat
the bf16 conv-transpose wgrad at resnet-50's training shapes?

Context: post-relu_store the training step is 49.7% wgrad fusions
(cnet_xprof --bwd); the s2 1x1 wgrad floor is 47.9 TF/s bf16 (M=64
sublane underfill, shown to be the shape's ceiling by wgrad_probe.py);
the isolated fc int8 probe crosses to a win at M>=512. This probe
slope-times, per resnet stage shape (b128 NHWC):
  a) the bf16 conv-transpose wgrad (what ops/mxu_grad's VJP runs),
  b) ops/mxu_grad._wgrad_q8 — the int8 wgrad conv INCLUDING its
     quantize passes (per-tensor act scale, per-out-chan cotangent
     scale, int8x8->int32 conv, f32 rescale),
so the comparison is end-to-end at the exact in-VJP form. int8 peak on
this chip is 2x bf16 (394 vs 197 TF/s, core/machine.py).

Reference context: the reference profiled its hand-written BckConv
kernels like any op (rtc_prof.cc:44; cnn_codegen.cc:480+ generators).
Run on the TPU: python scripts/wgrad_int8_probe.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _time(fn, args, flops, name, iters=16, reps=3):
    from boda_tpu.tune.prof import _chained_secs
    secs = _chained_secs(fn, args, iters, reps=reps)
    print(f"{name:46s} {secs * 1e3:8.3f} ms {flops / 1e9:9.2f} GF "
          f"{flops / secs / 1e12:7.1f} TF/s", flush=True)
    return secs


def case(name, n, cin, hw, cout, k, stride=1):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from boda_tpu.ops.mxu_grad import _wgrad_q8

    ohw = hw // stride
    p = (k - 1) // 2 if stride == 1 else ((k - 1) // 2 - (stride - 1) // 2)
    pad = ((p, p), (p, p))
    rng = np.random.RandomState(0)
    x = jnp.asarray(np.abs(rng.randn(n, hw, hw, cin)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, jnp.bfloat16)
    g = jnp.asarray(rng.randn(n, ohw, ohw, cout) * 0.1, jnp.float32)
    dn = ("NHWC", "HWIO", "NHWC")
    flops = 2.0 * n * ohw * ohw * cin * cout * k * k

    def conv(xv, wv):
        return lax.conv_general_dilated(
            xv, wv, window_strides=(stride, stride), padding=pad,
            dimension_numbers=lax.conv_dimension_numbers(
                x.shape, w.shape, dn))

    def wgrad_bf16(xv, gv):
        _, vjp = jax.vjp(lambda wv: conv(xv, wv), w)
        return vjp(gv.astype(jnp.bfloat16))[0].astype(jnp.float32).sum()

    def wgrad_int8(xv, gv):
        return _wgrad_q8(xv, w, gv, (stride, stride), pad).sum()

    sa = _time(wgrad_bf16, [x, g], flops, f"{name} bf16 conv-T")
    sb = _time(wgrad_int8, [x, g], flops, f"{name} INT8 _wgrad_q8")
    print(f"{'':46s} int8/bf16 time = {sb / sa:.3f}x "
          f"({'WIN' if sb < sa else 'loss'})", flush=True)


def main():
    from boda_tpu.backend.xla import enable_compilation_cache
    enable_compilation_cache()
    n = 128
    # the resnet-50 wgrad shape families, heaviest stages first
    case("s2 3x3 64->64 @56^2", n, 64, 56, 64, 3)
    case("s2 1x1 64->256 @56^2", n, 64, 56, 256, 1)
    case("s3 3x3 128->128 @28^2", n, 128, 28, 128, 3)
    case("s3 1x1 512->128 @28^2", n, 512, 28, 128, 1)
    case("s4 3x3 256->256 @14^2", n, 256, 14, 256, 3)
    case("s4 1x1 1024->256 @14^2", n, 1024, 14, 256, 1)
    case("s4 1x1 256->1024 @14^2", n, 256, 14, 1024, 1)
    case("s5 3x3 512->512 @7^2", n, 512, 7, 512, 3)
    case("s5 1x1 512->2048 @7^2", n, 512, 7, 2048, 1)


if __name__ == "__main__":
    main()
