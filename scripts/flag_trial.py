"""Compiler-options trials on the bench.py int8 headline config."""
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from boda_tpu.backend.xla import enable_compilation_cache
from boda_tpu.engine.lower import lower_pipe, resolve_plan_weights
from boda_tpu.engine.rtc_fwd import build_fused_forward
from boda_tpu.models.zoo import build_model
from boda_tpu.ops.cnn_variants import make_op_tune
from boda_tpu.tune.presets import load_act_scales, resnet_int8_site_tunes
from pathlib import Path

enable_compilation_cache()
batch, iters = 128, 30
pipe = build_model("resnet-50", batch=batch)
tune_s = "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0,fuse_siblings=1)"
op_tunes = resnet_int8_site_tunes(pipe, tune_s)
scales_fn = str(Path("/root/repo/tests/data/resnet50-b128-int8-scales.lexp"))
op_tunes = load_act_scales(scales_fn, op_tunes)
plan_q = lower_pipe(pipe, make_op_tune(tune_s), op_tunes=op_tunes,
                    fused_storage=True)
fwd_q = build_fused_forward(plan_q)
weights = resolve_plan_weights(plan_q, pipe.op_params)
d = pipe.get_data_img_dims()
x = np.random.RandomState(0).randn(*d.shape).astype(np.float32) * 0.1
dev = jax.devices()[0]
w_dev = {k: jax.device_put(v, dev) for k, v in weights.items()}
x_dev = jax.device_put(x, dev)


def make_chained(opts):
    def chained(w, x, n):
        def body(_i, carry):
            c, acc = carry
            p = fwd_q({"data": c}, w)["prob"]
            return c + p.sum() * 1e-12, acc + p[0, 0, 0, 0]
        _c, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc
    return jax.jit(chained, compiler_options=opts or None)


def slope_time(fn):
    n1 = max(2, iters // 5)
    float(fn(w_dev, x_dev, n1))
    float(fn(w_dev, x_dev, iters))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(w_dev, x_dev, n1))
        t1 = time.perf_counter()
        float(fn(w_dev, x_dev, iters))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (iters - n1))
    return statistics.median(slopes)


TRIALS = [
    ("baseline", None),
    ("lhs_off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("scavenge_on", {"xla_tpu_scavenge_vmem_for_fusions": "true"}),
    ("exp_sched", {"xla_tpu_enable_all_experimental_scheduler_features": "true"}),
    ("lhs_off+scavenge", {"xla_tpu_enable_latency_hiding_scheduler": "false",
                          "xla_tpu_scavenge_vmem_for_fusions": "true"}),
    ("exp_sched+scavenge", {"xla_tpu_enable_all_experimental_scheduler_features": "true",
                            "xla_tpu_scavenge_vmem_for_fusions": "true"}),
    ("baseline2", None),
]
for name, opts in TRIALS:
    try:
        fn = make_chained(opts)
        t0 = time.perf_counter()
        float(fn(w_dev, x_dev, 1))
        comp = time.perf_counter() - t0
        s = slope_time(fn)
        print(json.dumps({"trial": name, "step_ms": round(s * 1e3, 3),
                          "compile_s": round(comp, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"trial": name,
                          "err": str(e).splitlines()[0][:140]}), flush=True)
