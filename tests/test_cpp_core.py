"""Differential tests pinning the native C++ core (csrc/ →
build/libboda_tpu_core.so) to the pure-Python implementations: lexp
grammar + error strings, nda digest stats/qhash, framed stream transport
interop, and blf bin packing. Skipped when the library isn't built
(`make -C csrc`)."""

import os
import socket
import threading

import numpy as np
import pytest

from boda_tpu.core.error import RtErr

cpplib = pytest.importorskip("boda_tpu.utils.cpplib")
if not cpplib.cpp_available():
    pytest.skip("native core library not built (make -C csrc)",
                allow_module_level=True)

from boda_tpu.core.lexp import _parse_lexp_cpp, _parse_lexp_py  # noqa: E402


LEXP_CASES = [
    "",
    "plainleaf",
    "()",
    "(a=1)",
    "(a=1,b=2,c=(d=3,e=()))",
    "(a=1,)",  # trailing comma
    "(pos1,pos2,k=v)",  # positional
    r"(a=va\,lue,b=\(x\))",  # escapes
    "(fmt=%(var)refs,y=2)",  # interpolation ref pass-through
    "(deep=(a=(b=(c=(d=leaf))))))"[:-1],
    "(mode=rtc_test,n=4096,rtc=(be=ipc,worker_be=interp))",
]

LEXP_ERR_CASES = [
    "(a=1",           # unterminated
    "(a=(b)",         # unterminated nested... actually (b) closes; outer open
    "x)",             # trailing chars
    "(=v)",           # empty name
    "(a=1)junk",      # trailing
    "bad\\",          # escape at end
    "(a=un(escaped)", # ( in leaf
    "(fmt=%(unterm",  # unterminated var ref
]


def _tree_eq(a, b):
    if a.is_leaf != b.is_leaf:
        return False
    if a.is_leaf:
        return a.leaf_val == b.leaf_val
    if len(a.kids) != len(b.kids):
        return False
    return all(na == nb and _tree_eq(va, vb)
               for (na, va), (nb, vb) in zip(a.kids, b.kids))


@pytest.mark.parametrize("s", LEXP_CASES)
def test_lexp_parse_parity(s):
    assert _tree_eq(_parse_lexp_py(s), _parse_lexp_cpp(s))


@pytest.mark.parametrize("s", LEXP_ERR_CASES)
def test_lexp_error_string_parity(s):
    with pytest.raises(RtErr) as e_py:
        _parse_lexp_py(s)
    with pytest.raises(RtErr) as e_cpp:
        _parse_lexp_cpp(s)
    assert str(e_py.value) == str(e_cpp.value)


def test_lexp_parse_roundtrip_large():
    # big input takes the native path through the public parse_lexp()
    from boda_tpu.core.lexp import parse_lexp
    body = ",".join(f"k{i}=(a={i},b=v{i})" for i in range(400))
    s = f"({body})"
    assert len(s) >= 4096
    l = parse_lexp(s)
    assert len(l.kids) == 400
    assert str(l) == s


# ---- digest ----

def test_digest_parity():
    from boda_tpu.core.digest import nda_digest
    rng = np.random.RandomState(0)
    for arr in [rng.randn(1000).astype(np.float32),
                np.zeros(17), np.array([1.5]), rng.rand(64, 64) * 1e6,
                -np.abs(rng.randn(333))]:
        d_py = nda_digest(arr)
        d_cpp = nda_digest(arr, impl="cpp")
        assert d_py.qhash == d_cpp.qhash
        assert d_py.vmin == d_cpp.vmin and d_py.vmax == d_cpp.vmax
        assert abs(d_py.avg - d_cpp.avg) <= 1e-12 * max(1.0, abs(d_py.avg))
        assert abs(d_py.rms - d_cpp.rms) <= 1e-12 * max(1.0, abs(d_py.rms))
        assert d_py.comp(d_cpp, mrd_toler=1e-9) is None


# ---- stream transport interop (cpp <-> py over the same wire) ----

def test_stream_cpp_py_interop_tcp():
    from boda_tpu.parallel.transport import make_stream
    import random
    port = random.randint(20000, 40000)
    got = {}

    def server():  # native side listens
        s = make_stream(f"tcp-listen:{port}", is_server=True, impl="cpp")
        got["msg"] = s.read_frame()
        s.write_frame(b"pong" * 1000)
        s.close()

    t = threading.Thread(target=server)
    t.start()
    import time
    time.sleep(0.3)
    c = make_stream(f"tcp:127.0.0.1:{port}", impl="py")  # python side connects
    c.write_frame(b"ping")
    assert c.read_frame() == b"pong" * 1000
    t.join()
    assert got["msg"] == b"ping"
    c.close()


def test_stream_cpp_fifo(tmp_path):
    from boda_tpu.parallel.transport import make_stream
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    os.mkfifo(a)
    os.mkfifo(b)
    got = {}

    def server():
        s = make_stream(f"fns:{a}:{b}", is_server=True, impl="cpp")
        got["msg"] = s.read_frame()
        s.write_frame(b"ok")
        s.close()

    t = threading.Thread(target=server)
    t.start()
    c = make_stream(f"fns:{b}:{a}", impl="py")
    c.write_frame(b"hello fifo")
    assert c.read_frame() == b"ok"
    t.join()
    assert got["msg"] == b"hello fifo"
    c.close()


def test_stream_cpp_bad_addr():
    from boda_tpu.utils.cpplib import CppStream
    with pytest.raises(RtErr, match="unknown transport method"):
        CppStream("bogus:1:2")


# ---- blf packing ----

def test_blf_place_parity():
    from boda_tpu.apps.pyra import blf_place
    from boda_tpu.core.geom import Pt
    rng = np.random.RandomState(42)
    for trial in range(20):
        n = rng.randint(1, 30)
        sizes = [Pt(int(rng.randint(8, 120)), int(rng.randint(8, 120)))
                 for _ in range(n)]
        bin_sz = Pt(128, 128)
        pad = Pt(int(rng.randint(0, 4)), int(rng.randint(0, 4)))
        py = blf_place(sizes, bin_sz, pad, impl="py")
        cpp = blf_place(sizes, bin_sz, pad, impl="cpp")
        assert py == cpp, f"trial {trial}: {py} != {cpp}"


def test_blf_place_oversize_err():
    from boda_tpu.apps.pyra import blf_place
    from boda_tpu.core.geom import Pt
    with pytest.raises(RtErr, match="larger than bin"):
        blf_place([Pt(300, 10)], Pt(128, 128), Pt(0, 0), impl="cpp")
