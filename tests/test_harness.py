"""Harness-mode tests: test_cmds golden diff + err matching, test_compute_multi
digest comparison, test_dense sliding-window equivalence (reference §4 suite
semantics exercised end-to-end through the CLI modes).
"""

from pathlib import Path

import pytest

from boda_tpu.core.error import RtErr
from boda_tpu.core.has_main import create_and_run_has_main


def run_mode(s, **gv):
    return create_and_run_has_main(s, global_vars=gv or {})


def test_test_cmds_flow(tmp_path, capsys):
    spec = tmp_path / "cmds.txt"
    spec.write_text("\n".join([
        "(test_name=echo_ok,cmd=(mode=_hrn_echo,msg=hi,out_fn=o.txt))",
        "(test_name=expected_err,cmd=(mode=_hrn_echo,fail=1),err=echo failing as requested)",
        "(test_name=err_text_changed,cmd=(mode=_hrn_echo,fail=1),err=some other error)",
        "(test_name=gated,needs=no_such_feature,cmd=(mode=_hrn_echo))",
        "(test_name=slow_one,slow=1,cmd=(mode=_hrn_echo))",
    ]) + "\n")
    good = tmp_path / "good_tr"
    # first run: archive known-good (err_text_changed still fails: err mismatch)
    with pytest.raises(RtErr, match="1 test"):
        run_mode(f"(mode=test_cmds,cmds_fn={spec},good_tr_dir={good},"
                 f"update_failing=1,boda_output_dir={tmp_path}/out)")
    out = capsys.readouterr().out
    assert "archived new known-good" in out
    assert "expected error 'some other error' but got" in out
    # second run (without the bad line): clean pass + gating counts
    spec.write_text("\n".join([
        "(test_name=echo_ok,cmd=(mode=_hrn_echo,msg=hi,out_fn=o.txt))",
        "(test_name=expected_err,cmd=(mode=_hrn_echo,fail=1),err=echo failing as requested)",
        "(test_name=gated,needs=no_such_feature,cmd=(mode=_hrn_echo))",
        "(test_name=slow_one,slow=1,cmd=(mode=_hrn_echo))",
    ]) + "\n")
    run_mode(f"(mode=test_cmds,cmds_fn={spec},good_tr_dir={good},"
             f"boda_output_dir={tmp_path}/out)")
    out = capsys.readouterr().out
    assert "2/2 passed, 2 skipped, 0 failed" in out
    # golden regression: change the mode's output → diff failure
    spec.write_text("(test_name=echo_ok,cmd=(mode=_hrn_echo,msg=CHANGED,out_fn=o.txt))\n")
    with pytest.raises(RtErr):
        run_mode(f"(mode=test_cmds,cmds_fn={spec},good_tr_dir={good},"
                 f"boda_output_dir={tmp_path}/out)")
    out = capsys.readouterr().out
    assert "DIFFERING output file" in out and "-hi" in out and "+CHANGED" in out


def test_test_compute_multi(tmp_path, capsys):
    # 176² (not the full 192², and the smallest nopad-NIN-valid size):
    # the float64 ref engine dominates this test's ~25s; the comparison
    # logic is size-independent (r4 hygiene)
    run_mode(f"(mode=test_compute_multi,model=nin_imagenet_nopad,batch=1,"
             f"in_dims=(dims=(img=1,chan=3,y=176,x=176)),"
             f"boda_output_dir={tmp_path})")
    out = capsys.readouterr().out
    assert "comp ref vs rtc: PASS" in out
    dig = (tmp_path / "digest-ref.boda").read_text()
    assert "prob " in dig
    # kg digest comparison: self-consistent
    run_mode(f"(mode=test_compute_multi,model=nin_imagenet_nopad,batch=1,"
             f"in_dims=(dims=(img=1,chan=3,y=176,x=176)),"
             f"kg_digests_fn={tmp_path}/digest-ref.boda,"
             f"boda_output_dir={tmp_path})")
    out = capsys.readouterr().out
    assert "kg digests vs ref: PASS" in out
    # corrupted kg digests → failure
    bad = dig.replace("cnt=1000", "cnt=999")
    (tmp_path / "bad.boda").write_text(bad)
    with pytest.raises(RtErr, match="mismatches"):
        run_mode(f"(mode=test_compute_multi,model=nin_imagenet_nopad,batch=1,"
                 f"in_dims=(dims=(img=1,chan=3,y=176,x=176)),"
                 f"kg_digests_fn={tmp_path}/bad.boda,boda_output_dir={tmp_path})")


def test_test_dense(capsys):
    """Dense ≡ sliding window on a conv feature node (the §4.5 invariant)."""
    run_mode("(mode=test_dense,model=nin_imagenet_nopad,batch=1,"
             "in_dims=(dims=(img=1,chan=3,y=128,x=128)),out_node=conv2,win_sz=64)")
    out = capsys.readouterr().out
    assert "test_dense PASSED" in out


def test_test_dense_rejects_global_top():
    with pytest.raises(RtErr, match="no valid finite support"):
        run_mode("(mode=test_dense,model=nin_imagenet_nopad,batch=1)")


# helper mode used by test_cmds tests
from boda_tpu.core.config import Attr
from boda_tpu.core.has_main import HasMain, mode


@mode("_hrn_echo", help="harness test helper")
class _HrnEcho(HasMain):
    msg = Attr(str, default="d")
    out_fn = Attr(str, default="")
    fail = Attr(bool, default=False)

    def main(self):
        if self.fail:
            raise RtErr("echo failing as requested")
        if self.out_fn:
            self.out_path(self.out_fn).write_text(self.msg + "\n")


@pytest.mark.parametrize("gen_mode", ["gen_test_compute_tests",
                                      "gen_ops_prof_tests"])
def test_generated_cmds_suite(tmp_path, gen_mode):
    """test_all's generated suites (the reference's on-the-fly
    gen_test_compute_tests.xml / gen_ops_prof_tests.xml, test_nesi.cc:652-653):
    regenerate the spec, then run it against the shipped goldens."""
    from pathlib import Path
    root = Path(__file__).resolve().parents[1]
    # default global vars (the gen specs interpolate %(boda_test_dir))
    create_and_run_has_main(f"(mode={gen_mode},boda_output_dir={tmp_path})")
    create_and_run_has_main(
        f"(mode=test_cmds,cmds_fn={tmp_path}/{gen_mode}.txt,"
        f"good_tr_dir={root}/tests/good_tr,"
        f"boda_output_dir={tmp_path}/out)")


@pytest.mark.parametrize("cmds", ["base.txt", "modes.txt"])
def test_checked_in_cmds_suite(tmp_path, cmds):
    """The shipped CLI regression suites (tests/cmds/*.txt) must pass
    against their archived goldens (tests/good_tr/) — the reference's
    test_cmds + good_tr workflow, checked in."""
    from pathlib import Path
    root = Path(__file__).resolve().parents[1]
    run_mode(f"(mode=test_cmds,cmds_fn={root}/tests/cmds/{cmds},"
             f"good_tr_dir={root}/tests/good_tr,"
             f"boda_output_dir={tmp_path}/out)")
