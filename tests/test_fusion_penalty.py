"""In-net wisdom truth (VERDICT r2 #2): @net pseudo-platform runs, the
load_tune_index preference for them, and the fusion_penalty mode that
records them by measuring one-site-overridden whole-net times."""

from pathlib import Path

import pytest

from boda_tpu.core.has_main import create_and_run_has_main
from boda_tpu.models.zoo import build_model
from boda_tpu.ops.op_base import OpBase
from boda_tpu.tune.wisdom import (NET_PLAT_SUFFIX, OpWisdom, load_tune_index,
                                  read_wisdom_file, wisdom_key,
                                  write_wisdom_file)

PLAT = "xla:cpu:cpu"


def _sig():
    return OpBase.from_lexp(
        "(type=sgemm,dims_vals=(a=(M=64,K=64),b=(K=64,N=64),c=(M=64,N=64)))")


def test_load_tune_index_prefers_in_net_runs(tmp_path):
    w = OpWisdom(_sig())
    # standalone: hand tune wins big
    w.tune("(Mb=256)").add_run(PLAT, 1e-6)
    w.tune("(use_culibs=1)").add_run(PLAT, 9e-6)
    p = tmp_path / "w.wis"
    write_wisdom_file(p, [w])
    assert load_tune_index(p, PLAT)[wisdom_key(w.op)] == "(Mb=256)"
    # in-net: the hand kernel breaks fusion and loses -> vendor must win
    w.tune("(Mb=256)").add_run(PLAT + NET_PLAT_SUFFIX, 9e-5)
    w.tune("(use_culibs=1)").add_run(PLAT + NET_PLAT_SUFFIX, 2e-5)
    write_wisdom_file(p, [w])
    assert load_tune_index(p, PLAT)[wisdom_key(w.op)] == "(use_culibs=1)"
    # @net rows round-trip through the wire format
    w2 = read_wisdom_file(p)[0]
    assert w2.tunes["(Mb=256)"].runs[PLAT + NET_PLAT_SUFFIX] == pytest.approx(9e-5)


def test_fusion_penalty_mode_records_net_runs(tmp_path):
    pipe = build_model("mini", batch=2)
    op = pipe.get_op("conv2")
    w = OpWisdom(op.copy())
    # a fake standalone winner that differs from the vendor base
    w.tune("(prec=bf16)").add_run(PLAT, 1e-6)
    w.tune("(use_culibs=1)").add_run(PLAT, 5e-5)
    wfn = tmp_path / "w.wis"
    write_wisdom_file(wfn, [w])
    create_and_run_has_main(
        f"(mode=fusion_penalty,model=mini,batch=2,op_tune=(use_culibs=1),"
        f"wisdom_fn={wfn},iters=3,reps=1,boda_output_dir={tmp_path})")
    merged = read_wisdom_file(wfn)
    rec = next(m for m in merged if wisdom_key(m.op) == wisdom_key(op))
    net_plat = PLAT + NET_PLAT_SUFFIX
    assert net_plat in rec.tunes["(prec=bf16)"].runs
    assert net_plat in rec.tunes["(use_culibs=1)"].runs
    # and the index now picks based on the in-net rows
    pick = load_tune_index(wfn, PLAT)[wisdom_key(op)]
    runs = {ts: tw.runs[net_plat] for ts, tw in rec.tunes.items()
            if net_plat in tw.runs}
    assert pick == min(runs, key=runs.get)


def test_shipped_wisdom_carries_net_rows():
    """The checked-in resnet-50 b32 wisdom now contains on-chip @net rows
    (fusion_penalty run, r3): the tune index must refuse the standalone
    hand-kernel winners for every sig that was measured in-net."""
    ws = read_wisdom_file(Path(__file__).parent / "data"
                          / "wisdom-resnet50-b32.wis")
    plat = "xla:tpu:TPU v5 lite"
    base = "(use_culibs=1,prec=bf16,layout=nhwc)"
    net_sigs = [w for w in ws if any(
        plat + NET_PLAT_SUFFIX in tw.runs for tw in w.tunes.values())]
    assert len(net_sigs) >= 3
    idx = load_tune_index(Path(__file__).parent / "data"
                          / "wisdom-resnet50-b32.wis", plat)
    refused = 0
    for w in net_sigs:
        runs = {ts: tw.runs[plat + NET_PLAT_SUFFIX]
                for ts, tw in w.tunes.items()
                if plat + NET_PLAT_SUFFIX in tw.runs}
        pick = idx[wisdom_key(w.op)]
        assert pick == min(runs, key=runs.get)
        if pick == base:
            refused += 1
    assert refused >= 2  # the measured in-net losers stay vendor
