"""Cross-process data-stream stages (stream-src / stream-sink): the
reference's multi-process image-pipeline pattern (cap_app.cc:26-253
cs_disp/proc_ipc/display_ipc) rebuilt as ordinary stream stages over
parallel/transport, with a fork/exec-self spawn path."""

import threading

import numpy as np

from boda_tpu.core.dims import NDA, Dims
from boda_tpu.io.data_stream import (DataBlock, _pack_block, _unpack_block,
                                     make_data_stream, read_all_blocks)


def _blk(i):
    d = Dims.make(tn="float", y=3, x=4)
    v = (np.arange(12, dtype=np.float32) * (i + 1)).reshape(3, 4)
    return DataBlock(nda=NDA(d, v), tag=f"t{i}", meta="m", frame_ix=i,
                     timestamp_ns=1000 + i)


def test_pack_unpack_roundtrip_nested():
    db = _blk(0)
    db.ensure_has_subblocks()
    db.subblocks.append(_blk(1))
    db.subblocks.append(DataBlock(tag="empty", frame_ix=7))
    db.set_sdb(_blk(2))
    got, off = _unpack_block(_pack_block(db))
    assert got.tag == "t0" and got.meta == "m" and got.frame_ix == 0
    assert got.timestamp_ns == 1000
    np.testing.assert_array_equal(got.nda.v, db.nda.v)
    assert got.nda.dims == db.nda.dims
    assert got.num_subblocks() == 2
    np.testing.assert_array_equal(got.subblocks[0].nda.v, db.subblocks[0].nda.v)
    assert got.subblocks[1].nda is None and got.subblocks[1].frame_ix == 7
    np.testing.assert_array_equal(got.get_sdb("t2").nda.v, db.named["t2"].nda.v)


def test_stream_src_spawn_subprocess():
    """Producer process (fork/exec self) -> framed stream -> consumer."""
    src = make_data_stream("(mode=stream-src,spawn=(mode=test-gen,num=3,sz=4))")
    got = read_all_blocks(src)
    assert len(got) == 3
    # must match an in-process run of the same producer spec
    want = read_all_blocks(make_data_stream("(mode=test-gen,num=3,sz=4)"))
    for g, w in zip(got, want):
        assert g.nda.dims == w.nda.dims
        np.testing.assert_array_equal(g.nda.v, w.nda.v)
    # EOS is sticky
    assert not src.proc_block(DataBlock()).valid()


def test_stream_sink_src_over_fifos(tmp_path):
    """Two pipeline halves in threads over named fifos (fns transport)."""
    import os
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    os.mkfifo(a)
    os.mkfifo(b)
    errs = []

    def producer():
        try:
            ds = make_data_stream(
                f"(mode=pipe,stages=(_0=(mode=test-gen,num=4,sz=8),"
                f"_1=(mode=stream-sink,addr=fns:{a}:{b},listen=1)))")
            while ds.proc_block(DataBlock()).valid():
                pass
            ds.proc_block(DataBlock())  # EOF notification -> EOS frame
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = threading.Thread(target=producer)
    th.start()
    src = make_data_stream(f"(mode=stream-src,addr=fns:{b}:{a})")
    got = read_all_blocks(src)
    th.join(30)
    assert not errs
    assert len(got) == 4
    want = read_all_blocks(make_data_stream("(mode=test-gen,num=4,sz=8)"))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g.nda.v, w.nda.v)
