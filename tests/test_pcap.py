"""pcap stream stages (reference: data-stream-pcap.cc): file framing
round-trip, UDP payload extraction incl. in-order defragmentation, port
filter, and error paths."""

import struct

import numpy as np
import pytest

import boda_tpu.io.pcap  # noqa: F401  (registers the stages)
from boda_tpu.core.dims import NDA, Dims
from boda_tpu.core.error import RtErr
from boda_tpu.io.data_stream import (DataBlock, make_data_stream,
                                     read_all_blocks)


def _blk(data: bytes, i: int, ts_ns: int = 0):
    return DataBlock(nda=NDA(Dims.make(tn="uint8_t", v=len(data)),
                             np.frombuffer(data, np.uint8).copy()),
                     tag="t", frame_ix=i, timestamp_ns=ts_ns)


def _write(path, payloads, add_header=False, dport=2368):
    sink = make_data_stream(
        f"(mode=pcap-sink,fn={path},add_header={int(add_header)},"
        f"header_udp_dport={dport})")
    for i, d in enumerate(payloads):
        sink.proc_block(_blk(d, i, ts_ns=(1000 + i) * 1_000_000_000 + 42_000))
    sink.proc_block(DataBlock())
    return path


def test_pcap_raw_roundtrip(tmp_path):
    payloads = [b"alpha", b"", b"x" * 300]
    p = _write(tmp_path / "t.pcap", payloads)
    got = read_all_blocks(make_data_stream(f"(mode=pcap-src,fn={p})"))
    assert [g.nda.v.tobytes() for g in got] == payloads
    assert got[1].timestamp_ns == 1001 * 1_000_000_000 + 42_000
    # restart-only seek
    src = make_data_stream(f"(mode=pcap-src,fn={p})")
    read_all_blocks(src)
    assert src.seek_to_block(0) and not src.seek_to_block(2)
    assert len(read_all_blocks(src)) == 3


def test_pcap_udp_extraction_roundtrip(tmp_path):
    payloads = [b"hello-udp", b"B" * 64]
    p = _write(tmp_path / "u.pcap", payloads, add_header=True)
    got = read_all_blocks(make_data_stream(
        f"(mode=pcap-src,fn={p},extract_udp_payload=1)"))
    assert [g.nda.v.tobytes() for g in got] == payloads


def test_pcap_udp_port_filter(tmp_path):
    p1 = _write(tmp_path / "a.pcap", [b"keep"], add_header=True, dport=2368)
    got = read_all_blocks(make_data_stream(
        f"(mode=pcap-src,fn={p1},extract_udp_payload=1,udp_dest_port=2368)"))
    assert len(got) == 1
    got = read_all_blocks(make_data_stream(
        f"(mode=pcap-src,fn={p1},extract_udp_payload=1,udp_dest_port=9)"))
    assert got == []


def _ipv4_udp_packet(payload, ip_id=7, frag_off=0, mf=False, dport=2368,
                     udp_hdr=True):
    eth = b"\0" * 12 + struct.pack(">H", 0x0800)
    flags = (0x2000 if mf else 0) | (frag_off >> 3)
    udp = struct.pack(">HHHH", 443, dport, 8 + len(payload), 0) \
        if udp_hdr else b""
    ip = bytes([0x45, 0]) + struct.pack(">HHHBB",
                                        20 + len(udp) + len(payload), ip_id,
                                        flags, 64, 17) + b"\0\0" \
        + b"\x01\x02\x03\x04" + b"\x05\x06\x07\x08"
    return eth + ip + udp + payload


def _raw_pcap(tmp_path, packets):
    buf = struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 1 << 18, 1)
    for pkt in packets:
        buf += struct.pack("<IIII", 1, 0, len(pkt), len(pkt)) + pkt
    p = tmp_path / "frag.pcap"
    p.write_bytes(buf)
    return p


def test_pcap_defragmentation(tmp_path):
    # a UDP datagram split over two IP fragments (in order)
    part1 = _ipv4_udp_packet(b"12345678", mf=True)           # incl UDP hdr
    part2 = _ipv4_udp_packet(b"ABCDEFGH", frag_off=16, udp_hdr=False)
    p = _raw_pcap(tmp_path, [part1, part2])
    got = read_all_blocks(make_data_stream(
        f"(mode=pcap-src,fn={p},extract_udp_payload=1)"))
    assert len(got) == 1
    assert got[0].nda.v.tobytes() == b"12345678ABCDEFGH"


def test_pcap_noncontiguous_fragment_errors(tmp_path):
    part1 = _ipv4_udp_packet(b"12345678", mf=True)
    bad = _ipv4_udp_packet(b"ABCDEFGH", frag_off=64, udp_hdr=False)
    p = _raw_pcap(tmp_path, [part1, bad])
    src = make_data_stream(f"(mode=pcap-src,fn={p},extract_udp_payload=1)")
    with pytest.raises(RtErr, match="non-contiguous"):
        read_all_blocks(src)


def test_pcap_bad_magic(tmp_path):
    p = tmp_path / "bad.pcap"
    p.write_bytes(b"\0" * 32)
    with pytest.raises(RtErr, match="magic"):
        make_data_stream(f"(mode=pcap-src,fn={p})")


def test_pcap_trailer_padding_stripped(tmp_path):
    """NIC-padded frames: the IPv4 total-length field bounds the payload."""
    pkt = _ipv4_udp_packet(b"tiny")
    pkt += b"\0" * (60 - len(pkt)) if len(pkt) < 60 else b""
    p = _raw_pcap(tmp_path, [pkt])
    got = read_all_blocks(make_data_stream(
        f"(mode=pcap-src,fn={p},extract_udp_payload=1)"))
    assert got[0].nda.v.tobytes() == b"tiny"


def test_pcap_orphan_fragments_dropped(tmp_path):
    """mid-capture fragments with no datagram start are dropped, not
    misparsed as complete datagrams."""
    orphan_last = _ipv4_udp_packet(b"ABCDEFGH", frag_off=16, udp_hdr=False)
    orphan_mid = _ipv4_udp_packet(b"XYZW", frag_off=32, mf=True, udp_hdr=False)
    whole = _ipv4_udp_packet(b"ok")
    p = _raw_pcap(tmp_path, [orphan_last, orphan_mid, whole])
    got = read_all_blocks(make_data_stream(
        f"(mode=pcap-src,fn={p},extract_udp_payload=1)"))
    assert [g.nda.v.tobytes() for g in got] == [b"ok"]
