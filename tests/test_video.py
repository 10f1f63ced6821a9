"""Video stream tests (io/video.py; reference data-stream-ffmpeg.cc:533):
decode a generated clip into blocks, seek, round-trip through video-sink,
and feed a net via the batch stage."""

import numpy as np
import pytest

from boda_tpu.core.features import is_feature_enabled
from boda_tpu.io.data_stream import DataBlock, make_data_stream, read_all_blocks

pytestmark = pytest.mark.skipif(not is_feature_enabled("video"),
                                reason="needs feature 'video' (OpenCV)")


@pytest.fixture()
def clip(tmp_path):
    from boda_tpu.io.video import write_test_video
    fn = str(tmp_path / "clip.avi")
    write_test_video(fn, num_frames=8, ysz=64, xsz=48, fps=10)
    return fn


def test_video_src_decodes_all_frames(clip):
    src = make_data_stream({"mode": "video-src", "fn": clip})
    blocks = read_all_blocks(src)
    assert len(blocks) == 8
    b0 = blocks[0]
    assert b0.nda.v.shape == (3, 64, 48)
    assert b0.frame_ix == 0 and blocks[7].frame_ix == 7
    # 10 fps timestamps in ns
    assert blocks[3].timestamp_ns == pytest.approx(3e8, rel=0.01)
    # frame content: green channel is a y-gradient (MJPG is lossy: loose tol)
    g = b0.nda.v[1]
    assert g[60, 0] > g[1, 0] + 100


def test_video_src_max_frames_and_seek(clip):
    src = make_data_stream({"mode": "video-src", "fn": clip,
                            "max_frames": "3"})
    assert len(read_all_blocks(src)) == 3
    src2 = make_data_stream({"mode": "video-src", "fn": clip})
    assert src2.seek_to_block(5)
    b = src2.proc_block(DataBlock())
    assert b.frame_ix == 5
    # red channel phase moves 32 px-values/frame: frame 5 differs from 0
    src3 = make_data_stream({"mode": "video-src", "fn": clip})
    b0 = src3.proc_block(DataBlock())
    assert not np.allclose(b.nda.v[0], b0.nda.v[0])


def test_video_sink_roundtrip(clip, tmp_path):
    out_fn = str(tmp_path / "out.avi")
    pipe = make_data_stream({
        "mode": "pipe",
        "stages": {"_0": {"mode": "video-src", "fn": clip},
                   "_1": {"mode": "video-sink", "fn": out_fn}}})
    n_in = len(read_all_blocks(pipe))
    # EOF block flushes/releases the writer
    pipe.proc_block(DataBlock())
    back = make_data_stream({"mode": "video-src", "fn": out_fn})
    blocks = read_all_blocks(back)
    assert len(blocks) == n_in == 8
    assert blocks[0].nda.v.shape == (3, 64, 48)


def test_video_batch_scan_mode(clip, capsys):
    """Clip -> crop -> batch stage (the device feed path the reference
    drove with its ffmpeg reader), via the scan_data_stream CLI."""
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        f"(mode=scan_data_stream,max_blocks=2,"
        f"stream=(mode=batch,n=4,src=(mode=pipe,stages=("
        f"_0=(mode=video-src,fn={clip}),"
        f"_1=(mode=crop,ysz=32,xsz=32)))))", global_vars={})
    out = capsys.readouterr().out
    assert "img:4" in out and "chan:3" in out
    assert "2 blocks" in out


def test_video_frames_feed_a_net(clip):
    """Decoded frames actually run through a conv net end-to-end."""
    from boda_tpu.engine.lower import lower_pipe, resolve_plan_weights
    from boda_tpu.engine.rtc_fwd import build_fused_forward
    from boda_tpu.models.zoo import build_model
    src = make_data_stream({"mode": "batch", "n": "4",
                            "src": {"mode": "pipe", "stages": {
                                "_0": {"mode": "video-src", "fn": clip},
                                "_1": {"mode": "crop", "ysz": "32", "xsz": "32"}}}})
    b = src.proc_block(DataBlock())
    assert b.nda.v.shape == (4, 3, 32, 32)
    pipe = build_model("mini", batch=4)
    plan = lower_pipe(pipe)
    fwd = build_fused_forward(plan)
    weights = resolve_plan_weights(plan, pipe.op_params)
    out = np.asarray(fwd({"data": (b.nda.v / 255.0).astype(np.float32)},
                         weights)["prob"])
    assert out.shape[0] == 4 and np.isfinite(out).all()
    np.testing.assert_allclose(out[:, :, 0, 0].sum(1), 1.0, rtol=1e-3)
