"""On-chip timing for the max-pool backward formulations
(ops/pallas/pool._max_pool_first_match vs XLA SelectAndScatter).

resnet-50 pool1 at b128 (3x3/s2 on 112², 64 chan, bf16 NHWC storage —
the exact in-net training form). The discovery this closes: pool1's
SelectAndScatter backward measured 2.33 ms, 56% of the stem's whole
fwd+bwd floor (ROUND4_NOTES / docs/PERF.md training floor table).

MEASURED (this chip): fwd 0.326 ms, S&S bwd 2.341 ms, gather-form bwd
21.079 ms — the gather form is 9x WORSE on TPU (its k*k full-size
elementwise passes out-cost the scatter), so pool_bwd=gather is an
opt-in tune knob and the default backward stays SelectAndScatter.

Run on the TPU: python scripts/poolbwd_probe.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from boda_tpu.backend.xla import enable_compilation_cache
    from boda_tpu.core.dims import Dims
    from boda_tpu.ops.op_base import OpBase
    from boda_tpu.ops.registry import get_template
    from boda_tpu.tune.prof import _chained_secs

    enable_compilation_cache()
    n, c, h = 128, 64, 112

    op = OpBase({"type": "Pooling", "func_name": "pool"})
    op.set_dims("in", Dims.make(img=n, chan=c, y=h, x=h))
    op.set_dims("out", Dims.make(img=n, chan=c, y=56, x=56))
    op.set_null_dims("kern_sz", y=3, x=3)
    op.set_null_dims("stride", y=2, x=2)
    op.set_null_dims("in_pad", y=0, x=0)
    op.str_vals["io_layout"] = "nhwc"
    op.str_vals["pool_bwd"] = "gather"  # opt-in since the r4 measurement
    tmpl = get_template("pool")
    rfs = tmpl.check_args(op)
    fn = tmpl.build(rfs)  # carries the first-match gather VJP

    def native(xv):  # the pre-r4 form: jax differentiates via S&S
        xp = jnp.pad(xv, ((0, 0), (0, 1), (0, 1), (0, 0)),
                     constant_values=-jnp.inf)
        m = lax.reduce_window(xp, -jnp.inf, lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "valid")
        return m[:, :56, :56, :]

    rng = np.random.RandomState(0)
    x = jnp.asarray(np.maximum(rng.randn(n, h, h, c) * 0.3, 0),
                    jnp.bfloat16)
    g = jnp.asarray(rng.randn(n, 56, 56, c) * 0.1, jnp.bfloat16)

    def bwd_of(pool_fn):
        def f(xv, gv):
            _, vjp = jax.vjp(pool_fn, xv)
            return vjp(gv)[0].astype(jnp.float32).sum()
        return f

    for name, f, args in [
            ("pool1 fwd (template)", lambda xv: fn(xv).astype(jnp.float32).sum(), [x]),
            ("pool1 bwd select-and-scatter", bwd_of(native), [x, g]),
            ("pool1 bwd first-match gather", bwd_of(fn), [x, g])]:
        secs = _chained_secs(f, args, 16, reps=3)
        print(f"{name:32s} {secs * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
