"""Classification-accuracy evaluation tests (reference: test_lmdb mode,
lmdb_caffe_io.cc:36-62 + score_batch :10-34), driven through the
data-stream labeled sources."""

import numpy as np
import pytest

from boda_tpu.apps.eval_cls import score_batch
from boda_tpu.core.error import RtErr
from boda_tpu.core.has_main import create_and_run_has_main


def test_score_batch():
    out = np.zeros((3, 4, 1, 1), np.float32)
    out[0, 2] = 1.0   # gt 2 -> hit
    out[1, 0] = 1.0   # gt 3 -> miss (top1), hit at top2 via second-best
    out[1, 3] = 0.5
    out[2, 1] = 1.0   # gt 1 -> hit
    assert score_batch(out, [2, 3, 1], top_k=1) == 2
    assert score_batch(out, [2, 3, 1], top_k=2) == 3
    with pytest.raises(RtErr, match="gt output index too large"):
        score_batch(out, [7], top_k=1)


@pytest.fixture()
def labeled_npy(tmp_path):
    rng = np.random.RandomState(0)
    imgs = rng.randn(10, 3, 32, 32).astype(np.float32)
    labels = rng.randint(0, 10, size=10).astype(np.int64)
    ifn, lfn = tmp_path / "imgs.npy", tmp_path / "labels.npy"
    np.save(ifn, imgs)
    np.save(lfn, labels)
    return ifn, lfn, labels


def test_labeled_npy_src(labeled_npy):
    from boda_tpu.io.data_stream import make_data_stream, read_all_blocks
    ifn, lfn, labels = labeled_npy
    bs = read_all_blocks(make_data_stream(
        f"(mode=labeled-npy-src,images_fn={ifn},labels_fn={lfn})"))
    assert len(bs) == 10
    assert bs[0].nda.dims.names() == ("chan", "y", "x")
    got = [int(b.get_sdb("label").nda.v[0]) for b in bs]
    assert got == labels.tolist()


def test_test_lmdb_mode_end_to_end(labeled_npy, capsys):
    ifn, lfn, labels = labeled_npy
    # top_k = n_classes makes every prediction a hit -> acc 1 (checks the
    # batching/padding/scoring plumbing, not the random-weight net)
    create_and_run_has_main(
        f"(mode=test_lmdb,model=mini,batch=4,top_k=10,"
        f"src=(mode=labeled-npy-src,images_fn={ifn},labels_fn={lfn}))", {})
    out = capsys.readouterr().out
    assert "top_10_acc=1 num_pos=10 num_test=10" in out


def test_test_lmdb_max_imgs(labeled_npy, capsys):
    ifn, lfn, _ = labeled_npy
    create_and_run_has_main(
        f"(mode=test_lmdb,model=mini,batch=4,top_k=1,max_imgs=8,"
        f"src=(mode=labeled-npy-src,images_fn={ifn},labels_fn={lfn}))", {})
    out = capsys.readouterr().out
    assert "num_test=8" in out


def test_lmdb_parse_datums_mode(tmp_path, capsys):
    from boda_tpu.core.has_main import create_and_run_has_main
    db = tmp_path / "pat_lmdb"
    create_and_run_has_main(
        f"(mode=gen_lmdb,out_dir={db},num_imgs=5,chan=3,ysz=8,xsz=8,num_classes=2)", {})
    capsys.readouterr()
    create_and_run_has_main(
        f"(mode=lmdb_parse_datums,db_fn={db},num_to_read=3)", {})
    out = capsys.readouterr().out
    assert "read 3 datums" in out
    assert out.count("datum ") == 3 and "chan=3 y=8 x=8" in out
    # 0 = read all
    create_and_run_has_main(
        f"(mode=lmdb_parse_datums,db_fn={db},num_to_read=0)", {})
    assert "read 5 datums" in capsys.readouterr().out


def test_cls_agree_mode(labeled_npy, capsys):
    """Two identical engine configs must agree exactly; the stats line
    carries both accuracies + the three agreement metrics."""
    ifn, lfn, _ = labeled_npy
    create_and_run_has_main(
        f"(mode=cls_agree,model=mini,batch=4,"
        f"conv_fwd=(engine=rtc,op_tune=(use_culibs=1)),"
        f"conv_fwd_b=(engine=rtc,op_tune=(use_culibs=1)),"
        f"src=(mode=labeled-npy-src,images_fn={ifn},labels_fn={lfn}))", {})
    out = capsys.readouterr().out
    assert "top_1_agree=1 b_top1_in_a_top5=1 top_5_overlap=1" in out
    assert "num_test=10" in out
    # and the per-config accuracies match (same engine twice)
    import re
    m = re.search(r"top_1_acc_a=(\S+) top_1_acc_b=(\S+)", out)
    assert m and m.group(1) == m.group(2)
