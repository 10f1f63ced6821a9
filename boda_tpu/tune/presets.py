"""Measured tuning presets (per-model selective-site tune sets).

The reference carried per-op tuning knowledge in wisdom files; net-level
selective-precision site sets have no reference analog (quantization
there was a per-layer fixed-point experiment, rtc_fwd.cc:28-37) — these
are r3 ON-CHIP measurements (ROUND3_NOTES.md "Selective int8").
"""

from __future__ import annotations

import re

from ..ops.cnn_variants import OpTune, make_op_tune

# ResNet-family selective int8: the b128 sweep (13 configs) found int8
# pays on the K=9C 3x3 contractions of stages 3-5 AND on every stage-4/5
# conv (N>=256), while stage-2 (Cm=64) and stage-3 1x1s lose:
#   bf16 8.73 ms | all-3x3 8.01 | s3-5 3x3 7.61 | s3 3x3 + s4-5 all 7.33
RESNET_INT8_SITE_PATS = (r"res3[a-z0-9]*_branch2b",
                         r"res[45][a-z0-9]*_branch.*")


def resnet_int8_site_tunes(pipe, base_tune_spec: str) -> dict[str, OpTune]:
    """Tag→tune map applying dynamic int8 to the measured-winner site set
    of a ResNet-family pipe (no-op: returns {} for other nets)."""
    assert base_tune_spec.endswith(")")
    q = make_op_tune(base_tune_spec[:-1] + ",quant8=1)")
    rxs = [re.compile(p) for p in RESNET_INT8_SITE_PATS]
    return {op.tag: q for op in pipe.ops.values()
            if op.type == "Convolution"
            and any(rx.fullmatch(op.tag) for rx in rxs)}
