"""Isolated weight-gradient floors for the training ceiling proof
(VERDICT r3 #2 / docs/PERF.md training floor table): is the stem+s2
backward slowness an executor gap or XLA's own limit at those grad-conv
shapes?

For each case we slope-time (ROUND2_NOTES methodology: serially-chained
iterations, whole-output-sum readback):
  a) the XLA conv-transpose wgrad (what ops/mxu_grad's VJP runs),
  b) where expressible, a hand dot_general reformulation of the same
     contraction (1x1 wgrad == tall GEMM K=N*H*W), and
  c) for the stem, a space-to-depth variant (stride-2 7x7 -> dense 4x4
     on 2x2-phase-stacked input, same contraction size, 1.3x MACs).
If (b)/(c) cannot beat (a), the measured stage floor is the shape's
ceiling on this chip, mirroring the fwd stage2 Cm=64 argument.

Reference context: the reference profiled its hand-written BckConv
kernels like any op (rtc_prof.cc; conv_util.cc:732-800 backward-op
synthesis). Run on the TPU: python scripts/wgrad_probe.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _time(fn, args, flops, name, iters=16, reps=3):
    from boda_tpu.tune.prof import _chained_secs
    secs = _chained_secs(fn, args, iters, reps=reps)
    print(f"{name:42s} {secs * 1e3:8.3f} ms {flops / 1e9:9.2f} GF "
          f"{flops / secs / 1e12:7.1f} TF/s", flush=True)
    return secs


def conv_wgrad_case(name, n, cin, hw, cout, k, stride=1, iters=16):
    """(a) XLA conv-transpose wgrad at the given NHWC bf16 shape."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    ohw = hw // stride
    pad = ((k - 1) // 2, (k - 1) // 2) if stride == 1 else \
        (((k - 1) // 2 - (stride - 1) // 2),) * 2
    dn = lax.conv_dimension_numbers((n, hw, hw, cin), (k, k, cin, cout),
                                    ("NHWC", "HWIO", "NHWC"))

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, window_strides=(stride, stride), padding=(pad, pad),
            dimension_numbers=dn)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, hw, hw, cin) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, jnp.bfloat16)
    g = jnp.asarray(rng.randn(n, ohw, ohw, cout) * 0.1, jnp.bfloat16)

    def wgrad(xv, gv):
        _, vjp = jax.vjp(lambda wv: conv(xv, wv), w)
        return vjp(gv)[0].astype(jnp.float32).sum()

    flops = 2.0 * n * ohw * ohw * cin * cout * k * k
    _time(wgrad, [x, g], flops, f"{name} wgrad conv-T")
    return x, g, flops


def main():
    from boda_tpu.backend.xla import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from jax import lax

    n = 128

    # --- s2 3x3 64->64 @56^2 (the stage-interior 3x3s) ---
    conv_wgrad_case("s2 3x3 64->64 @56^2", n, 64, 56, 64, 3)

    # --- s2 1x1 64->256 @56^2: conv-T vs hand GEMM (same contraction) ---
    x, g, flops = conv_wgrad_case("s2 1x1 64->256 @56^2", n, 64, 56, 256, 1)

    def gemm_wgrad(xv, gv):
        xm = xv.reshape(-1, xv.shape[-1])          # (NHW, Cin)
        gm = gv.reshape(-1, gv.shape[-1])          # (NHW, Cout)
        out = lax.dot_general(xm, gm, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        return out.sum()

    _time(gemm_wgrad, [x, g], flops, "s2 1x1 64->256 hand GEMM K=401k")

    # comparator: the same-shape GEMM with a HEALTHY K (K=4096) at 100x
    # the M*N work — what the MXU does to this (M=64,N=256) output shape
    # when the contraction is not the entire tensor
    import numpy as _np
    rng = _np.random.RandomState(1)
    a = jnp.asarray(rng.randn(4096, 64) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.randn(4096, 256) * 0.1, jnp.bfloat16)

    def small_gemm(av, bv):
        out = lax.dot_general(av, bv, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        return out.sum()

    _time(small_gemm, [a, b], 2.0 * 4096 * 64 * 256,
          "comparator GEMM (64x256, K=4096)", iters=64)

    # --- stem 7x7/s2 3->64 @224^2: conv-T vs space-to-depth 4x4/s1 ---
    conv_wgrad_case("stem 7x7/s2 3->64 @224^2", n, 3, 224, 64, 7, stride=2)

    # s2d: x2 = 2x2 phase-stack of the padded input -> (N,112,112,12); a
    # dense 4x4/s1 conv on x2 has the SAME receptive geometry class (this
    # probe only needs the shape/rate, not arithmetic equivalence)
    import jax
    rng = _np.random.RandomState(2)
    x2 = jnp.asarray(rng.randn(n, 112, 112, 12) * 0.3, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(4, 4, 12, 64) * 0.05, jnp.bfloat16)
    g2 = jnp.asarray(rng.randn(n, 112, 112, 64) * 0.1, jnp.bfloat16)
    dn2 = lax.conv_dimension_numbers((n, 112, 112, 12), (4, 4, 12, 64),
                                     ("NHWC", "HWIO", "NHWC"))

    def conv2(xv, wv):
        return lax.conv_general_dilated(
            xv, wv, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=dn2)

    def wgrad2(xv, gv):
        _, vjp = jax.vjp(lambda wv: conv2(xv, wv), w2)
        return vjp(gv)[0].astype(jnp.float32).sum()

    _time(wgrad2, [x2, g2], 2.0 * n * 112 * 112 * 12 * 64 * 16,
          "stem-s2d 4x4/s1 12->64 @112^2 wgrad")


if __name__ == "__main__":
    main()
