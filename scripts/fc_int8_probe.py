"""Isolated fc1000-site int8 probe at serving batches (VERDICT r3 weak #6
/ builder r3 candidate #5): the M=batch matmul sites (fc1000-conv:
M=batch, K=2048, N=1000) lose int8 at b128 — do they win at b512+?

For each M we slope-time (ROUND2_NOTES methodology) the exact forms the
engine lowers:
  a) bf16 GEMM (mxu path: bf16 x bf16 -> f32) + bias,
  b) prequant static int8 (the shipped headline form, conv.py fn_pq):
     static-scale activation quant -> int8 x int8 -> i32 GEMM -> f32
     dequant by (s_act * per-oc weight scale) + bias.
The in-net counterpart is `cnet_bench --op-tunes-pat=(...fc1000-conv=...)`
(ROUND4_NOTES serving table). Run on the TPU:
python scripts/fc_int8_probe.py

Reference context: boda profiled per-op variants via rtc_prof
(rtc_prof.cc); its quantize experiments were per-layer fixed-point
(rtc_fwd.cc:28-37).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from boda_tpu.tune.prof import _chained_secs

    K, N = 2048, 1000
    rng = np.random.RandomState(0)
    w = (rng.randn(K, N) * 0.05).astype(np.float32)
    b = (rng.randn(N) * 0.1).astype(np.float32)
    # prequantized weights: per-out-chan symmetric int8 (lower.py pass)
    wa = np.abs(w).max(axis=0)
    sws = (wa / 127.0).astype(np.float32)
    wq = np.clip(np.round(w / sws[None, :]), -127, 127).astype(np.int8)
    act_absmax = 8.0  # static calibrated scale (value irrelevant to timing)

    print(f"{'case':34s} {'ms':>8s} {'GF':>9s} {'TF/s':>7s}")
    for M in (128, 256, 512, 1024, 2048, 4096):
        x = (rng.randn(M, K) * 0.5).astype(jnp.bfloat16)
        fl = 2 * M * N * K

        def bf16_fc(xv, wv, bv):
            y = jax.lax.dot_general(
                xv, wv.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return y + bv[None, :]

        def int8_fc(xv, wqv, swsv, bv, _s=act_absmax):
            s_act = jnp.float32(_s / 127.0)
            xq = jnp.clip(jnp.round(xv.astype(jnp.float32) / s_act),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, wqv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return y.astype(jnp.float32) * (s_act * swsv)[None, :] + bv[None, :]

        sa = _chained_secs(bf16_fc, [x, jnp.asarray(w), jnp.asarray(b)], 64)
        print(f"M={M:<5d} bf16 GEMM+bias              "
              f"{sa*1e3:8.4f} {fl/1e9:9.2f} {fl/sa/1e12:7.1f}", flush=True)
        sb = _chained_secs(int8_fc, [x, jnp.asarray(wq), jnp.asarray(sws),
                                     jnp.asarray(b)], 64)
        print(f"M={M:<5d} prequant-static-int8        "
              f"{sb*1e3:8.4f} {fl/1e9:9.2f} {fl/sb/1e12:7.1f}"
              f"   (int8/bf16 = {sb/sa:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
