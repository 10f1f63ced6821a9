"""rosbag-src (bag v2.0 container parser, no ROS dependency)."""

import numpy as np
import pytest

import boda_tpu.io.rosbag as R
from boda_tpu.core.error import RtErr
from boda_tpu.io.data_stream import DataBlock, make_data_stream, read_all_blocks


def _img(i, h=6, w=8, c=3):
    return (np.arange(h * w * c, dtype=np.uint8).reshape(h, w, c) + i)


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_bag_image_roundtrip(tmp_path, compression):
    msgs = [("/cam0", "sensor_msgs/Image", i * 10**9 + 5,
             R.encode_ros_image(_img(i), "rgb8", stamp_ns=i))
            for i in range(3)]
    msgs.append(("/lidar", "std_msgs/String", 10**8, b"\x01\x02\x03"))
    p = tmp_path / "t.bag"
    R.write_bag(p, msgs, compression=compression)
    got = read_all_blocks(make_data_stream(f"(mode=rosbag-src,fn={p})"))
    assert len(got) == 4
    # time-sorted: cam@5ns, lidar@0.1s, cam@1s+5, cam@2s+5
    assert got[1].tag == "/lidar"
    assert got[1].nda.v.tobytes() == b"\x01\x02\x03"
    for i, b in enumerate([got[0]] + got[2:]):
        assert b.tag == "/cam0" and b.meta == "sensor_msgs/Image/rgb8"
        assert b.timestamp_ns == i * 10**9 + 5
        np.testing.assert_array_equal(b.nda.v, _img(i))


def test_bag_topic_filter_and_seek(tmp_path):
    msgs = [("/a", "t", 1, b"A"), ("/b", "t", 2, b"B"), ("/a", "t", 3, b"C")]
    p = tmp_path / "t.bag"
    R.write_bag(p, msgs)
    src = make_data_stream(f"(mode=rosbag-src,fn={p},topics=/a,"
                           f"decode_images=0)")
    got = read_all_blocks(src)
    assert [g.nda.v.tobytes() for g in got] == [b"A", b"C"]
    assert src.seek_to_block(1)
    assert src.proc_block(DataBlock()).nda.v.tobytes() == b"C"
    assert not src.seek_to_block(99)


def test_bag_bgr_decode(tmp_path):
    img = _img(0)
    p = tmp_path / "t.bag"
    R.write_bag(p, [("/c", "sensor_msgs/Image", 1,
                     R.encode_ros_image(img, "bgr8"))])
    got = read_all_blocks(make_data_stream(f"(mode=rosbag-src,fn={p})"))[0]
    np.testing.assert_array_equal(got.nda.v, img[:, :, ::-1])


def test_bag_bad_magic(tmp_path):
    p = tmp_path / "bad.bag"
    p.write_bytes(b"#NOTABAG\n" + b"\0" * 32)
    with pytest.raises(RtErr, match="ROSBAG V2.0"):
        make_data_stream(f"(mode=rosbag-src,fn={p})")


def test_pointcloud2_codec_roundtrip():
    xyz = np.arange(2 * 5 * 3, dtype=np.float32).reshape(2, 5, 3) * 0.25
    body = R.encode_pointcloud2(xyz, stamp_ns=7 * 10**9 + 11, frame_id="velo")
    got, stamp = R.decode_pointcloud2(body)
    np.testing.assert_array_equal(got, xyz)
    assert stamp == 7 * 10**9 + 11


def test_rosbag_sink_roundtrip(tmp_path):
    """sink stage (images + pointclouds) -> bag -> rosbag-src."""
    from boda_tpu.core.dims import NDA, Dims
    from boda_tpu.io.data_stream import make_data_stream
    p = tmp_path / "o.bag"
    sink = make_data_stream(f"(mode=rosbag-sink,fn={p})")
    xyz = np.random.RandomState(0).randn(3, 7, 3).astype(np.float32)
    for i in range(2):
        db = DataBlock(tag="cam", meta="image", frame_ix=i,
                       timestamp_ns=i * 10**9)
        db.nda = NDA(Dims.make(tn="uint8_t", y=6, x=8, chan=3), _img(i))
        sink.proc_block(db)
    pc = DataBlock(tag="velo", meta="pointcloud", frame_ix=2,
                   timestamp_ns=5 * 10**8)
    pc.nda = NDA(Dims.make(tn="float", y=3, x=7, xyz=3), xyz)
    sink.proc_block(pc)
    sink.proc_block(DataBlock())  # EOF -> finalize
    assert "written" in sink.get_pos_info_str()
    got = read_all_blocks(make_data_stream(f"(mode=rosbag-src,fn={p})"))
    assert len(got) == 3
    by_tag = {}
    for b in got:
        by_tag.setdefault(b.tag, []).append(b)
    assert len(by_tag["/cam"]) == 2
    np.testing.assert_array_equal(by_tag["/cam"][1].nda.v, _img(1))
    assert by_tag["/velo"][0].meta == "pointcloud"
    np.testing.assert_allclose(by_tag["/velo"][0].nda.v, xyz, rtol=1e-6)


def test_rosbag_sink_subblock_topics(tmp_path):
    """per-subblock topic list; empty topic name skips that subblock."""
    from boda_tpu.core.dims import NDA, Dims
    from boda_tpu.io.data_stream import make_data_stream
    p = tmp_path / "s.bag"
    sink = make_data_stream(f"(mode=rosbag-sink,fn={p},topics=/a::/c)")
    db = DataBlock(frame_ix=0, timestamp_ns=1)
    db.ensure_has_subblocks()
    for t in range(3):
        sdb = DataBlock(tag=f"t{t}", meta="image", timestamp_ns=t)
        sdb.nda = NDA(Dims.make(tn="uint8_t", y=4, x=4, chan=3), _img(t, 4, 4))
        db.subblocks.append(sdb)
    sink.proc_block(db)
    sink.proc_block(DataBlock())
    got = read_all_blocks(make_data_stream(f"(mode=rosbag-src,fn={p})"))
    assert sorted(b.tag for b in got) == ["/a", "/c"]
    # count mismatch errors (reference parity)
    bad = make_data_stream(f"(mode=rosbag-sink,fn={tmp_path}/x.bag,topics=/a)")
    with pytest.raises(RtErr, match="topics count"):
        bad.proc_block(db)


def test_lidar_pipeline_to_bag(tmp_path):
    """velodyne-gen -> parse -> xyz -> rosbag-sink end-to-end."""
    import boda_tpu.io.velodyne  # noqa: F401  (registers velo stages)
    from boda_tpu.io.data_stream import make_data_stream
    p = tmp_path / "lidar.bag"
    ds = make_data_stream(
        "(mode=pipe,stages=((mode=velo-frame-gen,num=2),"
        "(mode=velo-pcdm-to-xyz),"
        f"(mode=rosbag-sink,fn={p})))")
    n = 0
    while True:
        db = ds.proc_block(DataBlock())
        if not db.valid():
            break
        n += 1
    ds.proc_block(DataBlock())  # ensure sink finalization propagated
    assert n == 2
    got = read_all_blocks(make_data_stream(f"(mode=rosbag-src,fn={p})"))
    assert len(got) == 2 and all(b.meta == "pointcloud" for b in got)
    assert got[0].nda.v.shape[-1] == 3
