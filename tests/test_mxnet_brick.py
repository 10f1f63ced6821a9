"""mxnet-brick (RecordIO) stream stages (reference: data-stream-mxnet.cc:
magic/lrec framing, 4-byte padding, split-at-magic record chaining)."""

import struct

import numpy as np
import pytest

from boda_tpu.core.dims import NDA, Dims
from boda_tpu.core.error import RtErr
from boda_tpu.io.data_stream import (DataBlock, make_data_stream,
                                     read_all_blocks)

MAGIC = 0xCED7230A


def _u8_block(data: bytes, i: int = 0):
    return DataBlock(nda=NDA(Dims.make(tn="uint8_t", v=len(data)),
                             np.frombuffer(data, np.uint8).copy()),
                     tag="t", frame_ix=i)


def _write_brick(path, payloads):
    sink = make_data_stream(f"(mode=mxnet-brick-sink,fn={path})")
    for i, p in enumerate(payloads):
        sink.proc_block(_u8_block(p, i))
    sink.proc_block(DataBlock())  # EOF -> flush
    return path


@pytest.mark.parametrize("payloads", [
    [b"hello", b"worlds!", b""],                      # plain, incl. empty
    [b"x" * 64, b"y" * 7],                            # pad exercise
    # payloads CONTAINING the magic at 4-aligned offsets -> split records
    [b"abcd" + struct.pack("<I", MAGIC) + b"efgh"],
    [struct.pack("<I", MAGIC) * 3],
    [b"12" + struct.pack("<I", MAGIC) + b"34"],       # unaligned: no split
])
def test_brick_roundtrip(tmp_path, payloads):
    p = _write_brick(tmp_path / "t.brick", payloads)
    got = read_all_blocks(make_data_stream(f"(mode=mxnet-brick-src,fn={p})"))
    assert len(got) == len(payloads)
    for g, want in zip(got, payloads):
        assert bytes(g.nda.v.tobytes()) == want


def test_brick_split_record_wire_format(tmp_path):
    """A magic-containing payload must be stored as chained chunks (cflag
    1,3) — the reference's reader would reject a raw embedded magic."""
    payload = b"abcd" + struct.pack("<I", MAGIC) + b"efgh"
    p = _write_brick(tmp_path / "t.brick", [payload])
    raw = p.read_bytes()
    m0, l0 = struct.unpack_from("<II", raw, 0)
    assert m0 == MAGIC and (l0 >> 29) == 1 and (l0 & ((1 << 29) - 1)) == 4
    m1, l1 = struct.unpack_from("<II", raw, 8 + 4)
    assert m1 == MAGIC and (l1 >> 29) == 3


def test_brick_skip_recs(tmp_path):
    p = _write_brick(tmp_path / "t.brick", [bytes([i]) * 4 for i in range(6)])
    got = read_all_blocks(make_data_stream(
        f"(mode=mxnet-brick-src,fn={p},skip_recs_after_cnt=1)"))
    assert [g.nda.v[0] for g in got] == [0, 2, 4]


def test_brick_bad_magic(tmp_path):
    p = tmp_path / "bad.brick"
    p.write_bytes(b"\0" * 16)
    src = make_data_stream(f"(mode=mxnet-brick-src,fn={p})")
    with pytest.raises(RtErr, match="expected magic"):
        src.proc_block(DataBlock())


def test_brick_truncated_header(tmp_path):
    p = tmp_path / "tr.brick"
    p.write_bytes(struct.pack("<I", MAGIC)[:3])
    src = make_data_stream(f"(mode=mxnet-brick-src,fn={p})")
    with pytest.raises(RtErr, match="bytes left"):
        src.proc_block(DataBlock())
