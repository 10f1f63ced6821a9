"""On-chip confirmation for the GoogLeNet cross-branch CHAIN-fusion
ablation (VERDICT r3 #3 / ROUND4_NOTES): at each inception module, could
fusing the two second-level branch convs (3x3reduce->3x3, 5x5reduce->5x5)
into ONE wide 5x5 conv (3x3 kernel center-embedded, block-zero weights)
beat running them separately?

The analytic answer is no: the wide conv pays 3.6-3.9x the MACs of the
separate pair (table in ROUND4_NOTES.md), so it wins only if its TF/s
rate exceeds the separate pair's by more than that factor — and the
chip's measured dot-chain ceiling (~147 TF/s vs the 79-91 TF/s isolated
branch floors) caps the possible rate gain at ~1.9x. This script
measures the actual rates at the module-4a shapes (b128, 14^2 spatial,
bf16 NHWC storage — the exact in-net form) to close the question with
hardware numbers.

Reference context: inception branch topology
(nets/googlenet_conv/deploy.prototxt); the sibling-fusion this would
generalize is ops/cnn_variants xla_conv2 (same-input SIBLINGS, exact
arithmetic — this candidate needed same-input CHAINS, inexact MACs).

Run on the TPU: python scripts/widebranch_probe.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def probe_conv(n, cin, hw, cout, k, iters=24, reps=3):
    import jax.numpy as jnp

    from boda_tpu.ops.pallas.conv import make_conv_op
    from boda_tpu.ops.registry import get_template
    from boda_tpu.tune.prof import _chained_secs

    op = make_conv_op(n, cin, hw, hw, cout, k, k, py=k // 2, px=k // 2,
                      relu=True)
    op.str_vals.update(prec="bf16", layout="nhwc", io_layout="nhwc",
                       edge_prec="bf16")
    tmpl = get_template("xla_conv")
    rfs = tmpl.check_args(op)
    fn = tmpl.build(rfs)
    flops = tmpl.flops(rfs)
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.randn(n, hw, hw, cin) * 0.3), jnp.bfloat16)
    w = (rng.randn(cout, cin, k, k) * 0.05).astype(np.float32)
    b = (rng.randn(cout) * 0.01).astype(np.float32)
    secs = _chained_secs(fn, [x, w, b], iters, reps=reps)
    return secs, flops


def main():
    from boda_tpu.backend.xla import enable_compilation_cache
    enable_compilation_cache()
    n, hw = 128, 14
    # inception 4a second-level branch convs (after the fused 1x1 trio):
    # 3x3: 96 -> 208, 5x5: 16 -> 48; wide fusion: 5x5 (96+16) -> (208+48)
    cases = [
        ("4a 3x3 96->208", (n, 96, hw, 208, 3)),
        ("4a 5x5 16->48", (n, 16, hw, 48, 5)),
        ("4a WIDE 5x5 112->256", (n, 112, hw, 256, 5)),
    ]
    rows = []
    for name, args in cases:
        secs, flops = probe_conv(*args)
        rows.append((name, secs, flops))
        print(f"{name:24s} {secs * 1e3:8.3f} ms {flops / 1e9:8.2f} GF "
              f"{flops / secs / 1e12:7.1f} TF/s", flush=True)
    sep = rows[0][1] + rows[1][1]
    wide = rows[2][1]
    print(f"separate pair: {sep * 1e3:.3f} ms   wide: {wide * 1e3:.3f} ms "
          f"-> wide/separate = {wide / sep:.2f}x "
          f"({'LOSES' if wide > sep else 'wins'})")


if __name__ == "__main__":
    main()
