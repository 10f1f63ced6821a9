"""asyncio dynamic-batching inference service tests (apps/aio_serve.py —
the asio host-concurrency analog, SURVEY §2.5: many concurrent clients
multiplexed onto one engine with request coalescing).
"""

import threading

import numpy as np
import pytest

from boda_tpu.apps.aio_serve import AioClsServer, classify_over_stream
from boda_tpu.core.error import RtErr
from boda_tpu.core.lexp import Lexp
from boda_tpu.parallel.transport import make_stream


def _start_server(**kw):
    srv = AioClsServer.init_from_lexp(Lexp.from_obj(
        {"model": "mini", "port": "0", **{k: str(v) for k, v in kw.items()}}))
    box = {}
    evt = threading.Event()
    AioClsServer._started_cb = staticmethod(
        lambda p: (box.update(port=p), evt.set()))
    th = threading.Thread(target=srv.main, daemon=True)
    th.start()
    assert evt.wait(120), "server did not start"
    AioClsServer._started_cb = None
    return srv, th, box["port"]


def test_concurrent_clients_coalesce():
    n = 4
    srv, th, port = _start_server(max_batch=n, batch_window_ms=800,
                                  num_requests=n, top_k=2)
    d = srv._img_dims
    results = [None] * n
    barrier = threading.Barrier(n)

    def client(i):
        img = (np.random.RandomState(i).randn(*d) * 0.1).astype(np.float32)
        st = make_stream(f"tcp:127.0.0.1:{port}", impl="py")
        barrier.wait()
        results[i] = classify_over_stream(st, img, 2)
        st.close()

    cs = [threading.Thread(target=client, args=(i,)) for i in range(n)]
    for c in cs:
        c.start()
    for c in cs:
        c.join(120)
    th.join(120)
    assert not th.is_alive()
    assert all(r is not None for r in results)
    # all 4 arrived inside the window: coalescing must have happened
    assert max(r[0] for r in results) >= 2
    for bsz, rows in results:
        assert rows.shape == (2, 2)
        assert 0 <= rows[0, 0] < 10 and 0 <= rows[0, 1] <= 1.0001


def test_single_request_and_quit():
    srv, th, port = _start_server(max_batch=2, batch_window_ms=5, top_k=3)
    d = srv._img_dims
    img = np.zeros(d, np.float32)
    st = make_stream(f"tcp:127.0.0.1:{port}", impl="py")
    bsz, rows = classify_over_stream(st, img, 3)
    assert bsz == 1 and rows.shape == (3, 2)
    # probs sorted descending
    assert rows[0, 1] >= rows[1, 1] >= rows[2, 1]
    st.write_frame(b"(op=quit)")
    assert st.read_frame() == b"(ok=1)"
    st.close()
    th.join(60)
    assert not th.is_alive()


def test_bad_dims_errors():
    srv, th, port = _start_server(max_batch=1, batch_window_ms=5,
                                  num_requests=1)
    st = make_stream(f"tcp:127.0.0.1:{port}", impl="py")
    bad = np.zeros((1, 2, 2), np.float32)
    with pytest.raises(RtErr, match="bad image dims"):
        classify_over_stream(st, bad, 1)
    # server still serves a good request afterwards
    bsz, rows = classify_over_stream(st, np.zeros(srv._img_dims, np.float32), 1)
    assert bsz == 1 and rows.shape == (1, 2)
    st.close()
    th.join(60)



def test_serve_bench_smoke(tmp_path, capsys):
    """serve_bench: slope-timed serving throughput (VERDICT r2 #5). On CPU
    just pin that it runs, coalesces, and emits a sane record."""
    import re

    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        f"(mode=serve_bench,model=mini,num_clients=3,n1=1,n2=3,"
        f"batch_window_ms=200,out_fn=sb.lexp,boda_output_dir={tmp_path})")
    out = capsys.readouterr().out
    assert (tmp_path / "sb.lexp").exists()
    m = re.search(r"slope over (\d+) reqs: ([\d.]+|nan) req/s", out)
    assert m, out
    assert int(m.group(1)) == 3 * (3 - 1)
    # under CPU-contention timing noise the slope can be unresolved (nan);
    # a resolved slope must be positive
    if m.group(2) != "nan":
        assert float(m.group(2)) > 0
    assert "mean realized batch" in out


def test_serve_bench_engine_passthrough(tmp_path, capsys):
    """serve_bench --engine forwards a conv_fwd spec to the server (the
    int8-resident serving A/B hook, VERDICT r4 #3): a quant8 per-site
    tune must reach the engine's lowering (op_tunes_pat log line) and
    the bench must still resolve."""
    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        f"(mode=serve_bench,model=mini,num_clients=2,n1=1,n2=3,"
        f"batch_window_ms=200,out_fn=sb.lexp,boda_output_dir={tmp_path},"
        f"engine=(engine=rtc,op_tune=(use_culibs=1,prec=bf16,layout=nhwc,"
        f"s2d=0),op_tunes_pat=(conv2=(use_culibs=1,prec=bf16,layout=nhwc,"
        f"s2d=0,quant8=1))))")
    out = capsys.readouterr().out
    assert "op_tunes_pat: tuned 1 op(s)" in out
    assert "mean realized batch" in out


def test_serve_bench_latency_decomposition(tmp_path, capsys):
    """The p2-p1 delta decomposition must be present and self-consistent:
    queue + engine per-request components are non-negative, and the
    recorded engine_ms_per_req = engine_ms_per_batch / realized batch."""
    import re

    from boda_tpu.core.has_main import create_and_run_has_main
    create_and_run_has_main(
        f"(mode=serve_bench,model=mini,num_clients=3,n1=1,n2=4,"
        f"batch_window_ms=200,out_fn=sb.lexp,boda_output_dir={tmp_path})")
    out = capsys.readouterr().out
    m = re.search(r"decomposition \(p2-p1\): queue ([\d.]+) ms/req, "
                  r"engine ([\d.]+) ms/batch \(([\d.]+) ms/req at "
                  r"realized batch ([\d.]+)\)", out)
    assert m, out
    q, eb, er, rb = (float(g) for g in m.groups())
    assert q >= 0 and eb > 0 and er > 0 and rb >= 1
    assert abs(er - eb / rb) < 0.05 * eb + 1e-6
    rec = (tmp_path / "sb.lexp").read_text()
    assert "queue_ms_per_req=" in rec and "engine_ms_per_batch=" in rec


def test_u8_wire_format_matches_f32():
    """wire_fmt=u8 (raw HWC uint8 on the wire, mean-subtract/BGR/transpose
    fused ON DEVICE into the forward — engine set_input_preproc) must
    produce the same predictions as the f32 path's host img_to_chw."""
    from boda_tpu.io.img import img_to_chw, make_test_pattern_img

    srv8, th8, port8 = _start_server(max_batch=1, batch_window_ms=5,
                                     num_requests=1, top_k=3, wire_fmt="u8")
    y, x, _c = srv8._img_dims
    raw = np.ascontiguousarray(make_test_pattern_img(y, x, mode=2), np.uint8)
    st = make_stream(f"tcp:127.0.0.1:{port8}", impl="py")
    bsz8, rows8 = classify_over_stream(st, raw, 3)
    st.close()
    th8.join(60)

    srv, th, port = _start_server(max_batch=1, batch_window_ms=5,
                                  num_requests=1, top_k=3)
    st = make_stream(f"tcp:127.0.0.1:{port}", impl="py")
    bszf, rowsf = classify_over_stream(
        st, img_to_chw(raw).astype(np.float32), 3)
    st.close()
    th.join(60)

    assert rows8.shape == rowsf.shape == (3, 2)
    np.testing.assert_array_equal(rows8[:, 0], rowsf[:, 0])  # same classes
    np.testing.assert_allclose(rows8[:, 1], rowsf[:, 1], rtol=2e-2, atol=1e-4)


def test_u8_wire_format_rejects_f32_request():
    srv, th, port = _start_server(max_batch=1, batch_window_ms=5,
                                  num_requests=1, wire_fmt="u8")
    st = make_stream(f"tcp:127.0.0.1:{port}", impl="py")
    y, x, _c = srv._img_dims
    with pytest.raises(RtErr, match="bad image dims"):
        classify_over_stream(st, np.zeros((3, y, x), np.float32), 1)
    bsz, rows = classify_over_stream(
        st, np.zeros(srv._img_dims, np.uint8), 1)
    assert bsz == 1 and rows.shape == (1, 2)
    st.close()
    th.join(60)
