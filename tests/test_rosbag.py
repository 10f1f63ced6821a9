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
    msgs.append(("/lidar", "sensor_msgs/PointCloud2", 10**8, b"\x01\x02\x03"))
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
