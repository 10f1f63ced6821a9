"""TPU-side known-good digests (VERDICT r2 #6): the entire golden corpus
pins CPU numerics only — a TPU lowering regression (e.g. a precision
default change) would pass CI. These tests compare the CPU engines against
per-layer digest streams RECORDED ON THE REAL CHIP (archived under
tests/data/tpu_digests/), within the §4.8 tolerance schema.

Recording procedure (run on the TPU, then archive digest-rtc.boda):
  python -m boda_tpu test_compute_multi --model=<m> --batch=1 --all-vars=1 \
      --engines='(rtc=(engine=rtc,keep_all_nodes=1))' \
      --boda-output-dir=tests/data/tpu_digests/<m>
For `model@variant` archives add the variant's build flags, e.g.
  ... --model=resnet-50 --model-opts='(num_classes=40)' \
      --weights-fn=tests/data/resnet50-shapes40.boda \
      --boda-output-dir='tests/data/tpu_digests/resnet-50@shapes40'
(reference analog: the caffe-produced kg_digests_fn flow,
test_compute.cc:267-269 — GPU-vs-CPU correctness testable without the
other engine installed.)
"""

from pathlib import Path

import pytest

from boda_tpu.core.dims import NDA
from boda_tpu.engine.iface import make_engine
from boda_tpu.models.zoo import build_model
from boda_tpu.ops.pallas.gen_data import gen_test_nda
from boda_tpu.testing.comp import comp_digests, read_digest_stream

ARCHIVE = Path(__file__).parent / "data" / "tpu_digests"

# §4.8 tolerance schema: cross-engine mrd_toler default 5e-4
# (test_compute.cc:44-46) with per-model overrides — the TPU digests go
# through the f32 xla path (HIGHEST precision), but TPU-vs-CPU f32
# accumulation drift compounds with depth: measured ~1.5e-3 at fc1000
# after 53 convs on resnet-50 (worst var; most are <1e-3). A lowering
# regression (e.g. a precision default flipping to bf16) shifts results
# by >1e-2, far outside these bounds. resnet-50's zoo weights are
# untrained (msra init): activations reach |x|~1e3 by stage 5, which
# amplifies relative drift to ~5e-3 worst-var — hence its 8e-3 bound.
MRD_TOLER = {"mini": 5e-4, "resnet-50": 8e-3,
             # vgg-19: 19 unnormalized convs at 224^2 with msra-random
             # weights — activations reach ~1e4 and f32 drift compounds
             # to ~2e-2 worst-var; a precision-default regression (bf16:
             # ~4e-3/op compounding over 19 layers) lands >> 1e-1
             "vgg-19": 3e-2,
             # TRAINED weights (VERDICT r3 #7): tame activations (the net
             # is normalized by training), so drift stays near the default
             "resnet-50@shapes40": 3e-3}
MRD_DEFAULT = 3e-3


def _spec_for(archive_name):
    """Archive dir name -> (zoo model, build kwargs, weights artifact).
    `model@variant` names pin digests for non-default weights — the
    trained resnet-50 snapshot exercises saturation/outlier numerics the
    crc32-seeded zoo weights never reach (VERDICT r3 #7)."""
    model = archive_name.split("@")[0]
    kw, wfn = {}, None
    if archive_name == "resnet-50@shapes40":
        kw = {"num_classes": 40}
        wfn = Path(__file__).parent / "data" / "resnet50-shapes40.boda"
    return model, kw, wfn


def _nodes_to_get(pipe):
    return [n for n, nd in pipe.nodes.items()
            if nd.dims is not None and nd.top_for]


def _run_all_nodes(archive_name, engine_spec):
    model, kw, wfn = _spec_for(archive_name)
    pipe = build_model(model, batch=1, **kw)
    if wfn is not None:
        from boda_tpu.apps.train import load_weights_into_pipe
        load_weights_into_pipe(pipe, str(wfn))
    eng = make_engine(engine_spec)
    eng.init(pipe)
    d = pipe.get_data_img_dims()
    blob = NDA(d, gen_test_nda(d, 0, 0.1))
    return eng.run_fwd({pipe.data_img_node_names[0]: blob},
                       _nodes_to_get(pipe))


def _archived_models():
    if not ARCHIVE.exists():
        return []
    return sorted(p.parent.name for p in ARCHIVE.glob("*/digest-rtc.boda"))


@pytest.mark.parametrize("model", [
    # vgg-19 is ~20s of pure conv re-execution — slow-gated; the other
    # archived models keep the digest pinning in the default loop
    pytest.param(m, marks=pytest.mark.slow) if m.startswith("vgg") else m
    for m in (_archived_models() or ["<none-archived>"])])
def test_cpu_engines_match_tpu_digests(model):
    if model == "<none-archived>":
        pytest.skip("no TPU digest archives recorded yet")
    kg = read_digest_stream(ARCHIVE / model / "digest-rtc.boda")
    assert kg, "empty TPU digest archive"
    # the float64 ref engine is only CI-affordable on the small model;
    # the rtc CPU engine is the one whose lowering the archive pins
    specs = ("(engine=rtc,keep_all_nodes=1)", "ref") if model == "mini" \
        else ("(engine=rtc,keep_all_nodes=1)",)
    for spec in specs:
        outs = _run_all_nodes(model, spec)
        # every archived node must exist and agree; nodes the CPU run
        # produced beyond the archive are ignored (ignore_missing)
        missing = [k for k in kg if k not in outs]
        assert not missing, f"{spec}: nodes missing vs TPU archive: {missing}"
        toler = MRD_TOLER.get(model, MRD_DEFAULT)
        errs = comp_digests(outs, kg, toler, ignore_missing=True)
        assert not errs, f"{spec} vs TPU digests: {errs[:5]}"
