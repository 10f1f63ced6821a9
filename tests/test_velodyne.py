"""Velodyne lidar stages (reference: data-stream-velo.cc): crc16,
gen->parse round-trip (32-laser, default-32 remap, FoV framing + azi
subblock), 64-laser block-id/dual-return paths, XYZ conversion."""

import struct

import numpy as np
import pytest

import boda_tpu.io.velodyne as V
from boda_tpu.core.config import Attr, register
from boda_tpu.core.dims import NDA, Dims
from boda_tpu.core.error import RtErr
from boda_tpu.io.data_stream import DataBlock, DataStream, make_data_stream


def test_velo_crc_reference_vector():
    # the reference's own default test vector (data-stream-velo.cc:79-80)
    assert V.velo_crc(bytes.fromhex("0607")) == 0x9411


def test_default_32_mapping_is_permutation():
    m = V.default_32_laser_to_row()
    assert sorted(m) == list(range(32))
    assert m[0] == 31 and m[1] == 15  # downward-most lower/upper first


def _frame_for(n_azi=192):
    r = np.arange(32, dtype=np.uint16)[:, None]
    c = np.arange(n_azi, dtype=np.uint16)[None, :]
    return (r * 500 + c).astype(np.uint16)


@pytest.mark.parametrize("remap", ["", "default-32"])
def test_gen_parse_roundtrip(remap):
    """velodyne-gen -> velodyne recovers the frame columns (matched via
    the azi subblock, which pins each output column to a source azi)."""
    n = 192
    spec = (f"(mode=velodyne,fov_rot_samps={n},fov_center=0,"
            f"tot_lasers=32,laser_to_row_ix_str={remap},"
            f"vps=(mode=velodyne-gen,src=(mode=velo-frame-gen,"
            f"num=4,n_azi={n}),laser_to_row_ix_str={remap}))")
    ds = make_data_stream(spec)
    fr = ds.proc_block(DataBlock())
    assert fr.valid()
    assert fr.nda.dims.shape == (32, n)
    assert fr.meta == "lidar/VD_HDL32"
    azi = fr.subblocks[0].nda.v.astype(np.float64) / 100.0
    orig = _frame_for(n)
    step = 0.165
    for i in range(n):
        a = azi[i]
        if a >= 180.0:
            a -= 360.0
        ai = int(round(a / step + n / 2.0))
        np.testing.assert_array_equal(fr.nda.v[:, i], orig[:, ai % n])
    # frames keep coming (one per revolution of input)
    assert ds.proc_block(DataBlock()).valid()


def _packet64(rots):
    """synthetic 64-laser packet: 12 fbs = 6 azis x (lower, upper)."""
    assert len(rots) == 6
    fbs = []
    for rot in rots:
        for half in range(2):
            lis = b"".join(struct.pack("<HB", half * 1000 + i, 7)
                           for i in range(32))
            fbs.append(struct.pack("<HH", V.BLOCK_IDS[half], rot) + lis)
    return b"".join(fbs) + struct.pack("<IBB", 123, 0, 0)


@register(DataStream, "velo-pkt-list-test", help="test helper: fixed packets")
class PktListTest(DataStream):
    n_rev = Attr(int, default=3)

    def data_stream_init(self):
        self._i = 0
        rots = [(i * 300) % 36000 for i in range(120)]  # 3-deg steps
        self._pkts = []
        for rev in range(self.n_rev):
            for j in range(0, 120, 6):
                self._pkts.append(_packet64(
                    [rots[(j + k) % 120] for k in range(6)]))

    def proc_block(self, db: DataBlock) -> DataBlock:
        if self._i >= len(self._pkts):
            return DataBlock()
        p = self._pkts[self._i]
        self._i += 1
        return DataBlock(nda=NDA(Dims.make(tn="uint8_t", v=len(p)),
                                 np.frombuffer(p, np.uint8).copy()),
                         tag="pkt", frame_ix=self._i - 1)


def test_velodyne_64_laser_parse():
    ds = make_data_stream(
        "(mode=velodyne,fov_rot_samps=64,fov_center=180,tot_lasers=64,"
        "dual_return_and_use_only_first_return=0,"
        "vps=(mode=velo-pkt-list-test,n_rev=3))")
    fr = ds.proc_block(DataBlock())
    assert fr.valid()
    assert fr.nda.dims.shape == (64, 64)
    # lower block lasers carry 0..31, upper carry 1000..1031
    col = fr.nda.v[:, 0]
    np.testing.assert_array_equal(col[:32], np.arange(32))
    np.testing.assert_array_equal(col[32:], 1000 + np.arange(32))


def test_velodyne_bad_block_id():
    ds = make_data_stream(
        "(mode=velodyne,fov_rot_samps=64,tot_lasers=32,"
        "vps=(mode=velo-pkt-list-test,n_rev=1))")
    with pytest.raises(RtErr, match="unexpected block_id"):
        ds.proc_block(DataBlock())  # 64-style packets in 32 mode


def test_velo_to_xyz():
    n = 8
    v = np.full((32, n), 1000, np.uint16)
    db = DataBlock(nda=NDA(Dims.make(tn="uint16_t", y=32, x=n), v))
    azi = np.zeros((n,), np.uint16)  # all at 0 deg (facing +y)
    sb = DataBlock(nda=NDA(Dims.make(tn="uint16_t", x=n), azi), tag="azi",
                   meta="azi")
    db.ensure_has_subblocks()
    db.subblocks.append(sb)
    out = make_data_stream("(mode=velo-pcdm-to-xyz)").proc_block(db)
    assert out.nda.dims.shape == (32, n, 3)
    xyz = out.nda.v
    d = 1000 * 0.002
    # row 0 elevation +10.67 deg; azimuth 0 -> x=0, y=d*cos(e), z=d*sin(e)
    e = np.deg2rad(10.67)
    np.testing.assert_allclose(xyz[0, 0], [0, d * np.cos(e), d * np.sin(e)],
                               atol=1e-6)
    assert out.meta == "pointcloud"


def test_velodyne_through_pcap(tmp_path):
    """the real deployment shape: velodyne packets inside a pcap capture
    (gen -> pcap-sink add_header -> pcap-src extract -> velodyne)."""
    import boda_tpu.io.pcap  # noqa: F401
    n = 96
    gen = make_data_stream(
        f"(mode=pipe,stages=(_0=(mode=velodyne-gen,"
        f"src=(mode=velo-frame-gen,num=3,n_azi={n})),"
        f"_1=(mode=pcap-sink,fn={tmp_path}/v.pcap,add_header=1)))")
    while gen.proc_block(DataBlock()).valid():
        pass
    gen.proc_block(DataBlock())
    ds = make_data_stream(
        f"(mode=velodyne,fov_rot_samps={n},fov_center=0,tot_lasers=32,"
        f"vps=(mode=pcap-src,fn={tmp_path}/v.pcap,extract_udp_payload=1,"
        f"udp_dest_port=2368))")
    fr = ds.proc_block(DataBlock())
    assert fr.valid() and fr.nda.dims.shape == (32, n)
