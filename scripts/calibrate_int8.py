"""Generate calibrated static-int8 activation-scale artifacts.

Produced the shipped tests/data/*-int8-scales.lexp files (r3). Runs a
float forward on CPU over a fixed calibration input and records each
quantized site's input absmax (tune/presets.calibrate_int8_act_scales —
the TPU-native analog of the reference's externally-supplied per-layer
max_val quantize ranges, rtc_fwd.cc:28-37).

Usage:
    python scripts/calibrate_int8.py <model> <batch> <out.lexp> <pat[;pat]>
e.g.
    python scripts/calibrate_int8.py vgg16-conv 64 \
        tests/data/vgg16-b64-int8-scales.lexp "conv[3-5]_[0-9]"
    python scripts/calibrate_int8.py resnet-50 128 \
        tests/data/resnet50-b128-int8-scales.lexp \
        "res3[a-z0-9]*_branch2b;res[45][a-z0-9]*_branch.*"
"""
import os
import re
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # displace an externally-set platform
import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from boda_tpu.models.zoo import build_model  # noqa: E402
from boda_tpu.ops.cnn_variants import make_op_tune  # noqa: E402
from boda_tpu.tune.presets import (calibrate_int8_act_scales,  # noqa: E402
                                   save_act_scales)

model, batch, out_fn, pats = (sys.argv[1], int(sys.argv[2]), sys.argv[3],
                              sys.argv[4])
tune_s = "(use_culibs=1,prec=bf16,layout=nhwc,s2d=0,fuse_siblings=1)"
pipe = build_model(model, batch=batch)
d = pipe.get_data_img_dims()
x = (np.random.RandomState(0).randn(*d.shape) * 0.1).astype(np.float32)
q = make_op_tune(tune_s[:-1] + ",quant8=1)")
rxs = [re.compile(p) for p in pats.split(";")]
site = {op.tag: q for op in pipe.ops.values()
        if op.type == "Convolution" and any(r.fullmatch(op.tag) for r in rxs)}
print(model, "sites:", len(site), flush=True)
stat = calibrate_int8_act_scales(pipe, tune_s, x, site)
save_act_scales(out_fn, stat)
print("saved", out_fn, flush=True)
