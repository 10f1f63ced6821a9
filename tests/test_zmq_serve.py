"""ZMQ inference-service tests (reference: zmq-util.cc req/rep protocol,
det stub server, zmq-det data-stream annotation stage)."""

import threading

import numpy as np
import pytest

pytest.importorskip("zmq")

from boda_tpu.core.dims import NDA, Dims  # noqa: E402
from boda_tpu.core.has_main import create_and_run_has_main  # noqa: E402


def _ep(tmp_path, name):
    return f"ipc://{tmp_path}/{name}"


def _serve_in_thread(spec):
    t = threading.Thread(target=create_and_run_has_main, args=(spec, {}))
    t.start()
    return t


def test_hello_roundtrip(tmp_path, capsys):
    ep = _ep(tmp_path, "hello")
    t = _serve_in_thread(f"(mode=zmq_hello_server,endpoint={ep},num_req=1)")
    create_and_run_has_main(f"(mode=zmq_hello_client,endpoint={ep})", {})
    t.join(timeout=10)
    assert "world (hello)" in capsys.readouterr().out


def test_det_stub_roundtrip(tmp_path, capsys):
    ep = _ep(tmp_path, "det")
    img = tmp_path / "img.bin"
    img.write_bytes(b"\x01\x02\x03\x04" * 16)
    t = _serve_in_thread(f"(mode=zmq_det_stub_server,endpoint={ep},num_req=2)")
    create_and_run_has_main(
        f"(mode=zmq_det_client,endpoint={ep},image_fn={img},num_iter=2)", {})
    t.join(timeout=10)
    out = capsys.readouterr().out
    assert out.count("box: x=100 y=100 w=200 h=200 conf=0.98") == 2


def test_zmq_det_stream_annotates(tmp_path):
    from boda_tpu.io.data_stream import DataBlock, make_data_stream, \
        read_all_blocks
    ep = _ep(tmp_path, "dets")
    t = _serve_in_thread(f"(mode=zmq_det_stub_server,endpoint={ep},num_req=3)")
    ds = make_data_stream(
        f"(mode=pipe,stages=((mode=test-gen,num=3,sz=8),"
        f"(mode=zmq-det,endpoint={ep})))")
    bs = read_all_blocks(ds)
    t.join(timeout=10)
    assert len(bs) == 3
    for b in bs:
        boxes = b.get_sdb("boxes")
        assert boxes is not None
        assert boxes.nda.v.shape == (1, 5)
        assert boxes.nda.v[0, 4] == np.float32(0.98)


def test_nda_wire_roundtrip(tmp_path):
    import zmq

    from boda_tpu.apps.zmq_serve import recv_nda, send_nda
    ctx = zmq.Context()
    a = ctx.socket(zmq.PAIR)
    b = ctx.socket(zmq.PAIR)
    ep = _ep(tmp_path, "pair")
    a.bind(ep)
    b.connect(ep)
    nda = NDA(Dims.make(tn="float", y=3, x=4),
              np.arange(12, dtype=np.float32).reshape(3, 4))
    send_nda(a, nda)
    got = recv_nda(b)
    assert got.dims == nda.dims
    np.testing.assert_array_equal(got.v, nda.v)
    a.close()
    b.close()
    ctx.term()


def test_zmq_det_server_real_detections(tmp_path, capsys):
    """The real pyramid-dense-inference service (zmq_det_server): a test
    image must come back with >= 1 box in client-image coordinates."""
    from boda_tpu.io.img import make_test_pattern_img, save_img
    ep = _ep(tmp_path, "realdet")
    img_fn = tmp_path / "in.png"
    save_img(img_fn, make_test_pattern_img(96, 80, 2))
    t = _serve_in_thread(
        f"(mode=zmq_det_server,endpoint={ep},num_req=1,model=mini,"
        f"out_node=conv2,in_sz=48,bin_sz=96,min_sz=24,"
        f"filt_show_thresh=0.05)")
    create_and_run_has_main(
        f"(mode=zmq_det_client,endpoint={ep},image_fn={img_fn})", {})
    t.join(timeout=120)
    out = capsys.readouterr().out
    boxes = [ln for ln in out.splitlines() if ln.startswith("box:")]
    assert boxes, out
    # coords scaled back to the 96x80 client image
    for ln in boxes:
        w = float(ln.split("w=")[1].split()[0])
        assert 0 < w <= 80 + 1
