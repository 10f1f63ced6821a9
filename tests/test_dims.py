"""Named-dims / NDA tests (reference: boda_base dims_t/nda_t semantics)."""

import numpy as np
import pytest

from boda_tpu.core.digest import Digest, nda_digest
from boda_tpu.core.dims import NDA, Dim, Dims
from boda_tpu.core.error import RtErr


def test_basic():
    d = Dims.make(img=8, chan=64, y=56, x=56)
    assert d.shape == (8, 64, 56, 56)
    assert d.names() == ("img", "chan", "y", "x")
    assert d["chan"] == 64
    assert d.ix("y") == 2
    assert d.sz() == 8 * 64 * 56 * 56
    assert "chan" in d and "z" not in d
    with pytest.raises(RtErr):
        d["nope"]


def test_strides():
    d = Dims.make(a=2, b=3, c=4)
    assert d.strides() == (12, 4, 1)
    d2 = Dims([Dim("a", 2, 100), Dim("b", 3), Dim("c", 4)])
    assert d2.strides() == (100, 4, 1)


def test_template_matching():
    d = Dims.make(img=8, chan=64, y=56, x=56)
    t = Dims.make(img=0, chan=0, y=0, x=0)
    assert d.matches_template(t)
    assert not d.matches_template(Dims.make(img=0, chan=32, y=0, x=0))
    assert not d.matches_template(Dims.make(b=0, chan=0, y=0, x=0))
    assert d.matches_template(t.with_tn("any"))
    assert not d.matches_template(t.with_tn("bf16"))


def test_lexp_round_trip():
    d = Dims.make(tn="uint32_t", out_chan=16, in_chan=192, y=1, x=1)
    s = str(d)
    assert s == "(tn=uint32_t,dims=(out_chan=16,in_chan=192,y=1,x=1))"
    d2 = Dims.from_lexp(s)
    assert d == d2
    # default float tn omitted
    assert str(Dims.make(y=2, x=3)) == "(dims=(y=2,x=3))"
    # reference wisdom-file style parses
    d3 = Dims.from_lexp("(tn=none,dims=(y=0,x=0))")
    assert d3.tn == "none" and d3.shape == (0, 0)


def test_ordering_hash():
    a = Dims.make(M=128, N=128)
    b = Dims.make(M=128, N=128)
    c = Dims.make(M=128, N=256)
    assert a == b and hash(a) == hash(b)
    assert a != c and (a < c or c < a)
    assert len({a, b, c}) == 2


def test_functional_updates():
    d = Dims.make(img=1, chan=3, y=4, x=5)
    assert d.with_dim("chan", 8)["chan"] == 8
    assert d.drop("img").names() == ("chan", "y", "x")
    assert d.reorder(["y", "x", "img", "chan"]).shape == (4, 5, 1, 3)
    assert d.append("v", 8).names()[-1] == "v"


def test_nda():
    n = NDA.from_array(np.arange(6, dtype=np.float32).reshape(2, 3), ["y", "x"])
    assert n.dims.tn == "float"
    assert n.shape == (2, 3)
    s = NDA.scalar(16)
    assert s.item() == 16 and str(s) == "(tn=uint32_t,v=16)"
    s2 = NDA.from_lexp("(tn=uint32_t,v=16)")
    assert s2.item() == 16


def test_nda_bwrite_bread():
    n = NDA.from_array(np.arange(6, dtype=np.float32).reshape(2, 3), ["y", "x"])
    buf = n.bwrite()
    n2, off = NDA.bread(buf)
    assert off == len(buf)
    assert n2.dims == n.dims
    np.testing.assert_array_equal(n2.v, n.v)


def test_digest_round_trip_and_compare():
    rng = np.random.RandomState(42)
    x = rng.randn(4, 8).astype(np.float32)
    d = nda_digest(NDA.from_array(x, ["a", "b"]))
    d2 = Digest.from_lexp(str(d))
    assert d2.comp(d, 0.0) is None
    # small perturbation passes with tolerance, fails without
    d3 = nda_digest(NDA.from_array(x * (1 + 1e-6), ["a", "b"]))
    assert d3.comp(d, 1e-4) is None
    d4 = nda_digest(NDA.from_array(x * 1.1, ["a", "b"]))
    msg = d4.comp(d, 1e-4)
    assert msg is not None and "mismatch" in msg


def test_sig_ndas_are_dims_only():
    """Op signatures declare shapes, they never carry buffers: a b128
    conv sig used to pin ~200MB of zeros per entry and its cache key
    repr'd the bytes (measured 0.8GB/3.9s per gen_func). dims_only NDAs
    + crc-capped keys keep signature handling metadata-sized."""
    from boda_tpu.core.dims import NDA, Dims
    from boda_tpu.ops.op_base import OpBase

    sig = OpBase({"type": "Convolution", "func_name": "xla_conv"})
    sig.set_dims("in", Dims.make(tn="float", img=128, chan=64, y=56, x=56))
    sig.set_dims("in_pad", Dims.make(tn="none", y=1, x=1))
    assert all(v.v is None for v in sig.nda_vals.values())
    assert len(repr(sig._key())) < 4096
    # dims_only is metadata-only even for typed dims
    nda = NDA.dims_only(Dims.make(tn="float", a=1024, b=1024))
    assert nda.v is None and nda.dims.shape == (1024, 1024)
    # values that DO matter still key by content; big buffers key by crc
    import numpy as np
    s1 = OpBase({"type": "t"})
    s2 = OpBase({"type": "t"})
    s1.nda_vals["m"] = NDA.scalar(1, "uint32_t")
    s2.nda_vals["m"] = NDA.scalar(2, "uint32_t")
    assert s1._key() != s2._key()
    big = Dims.make(tn="float", n=100000)
    b1 = NDA(big, np.zeros(100000, np.float32))
    b2 = NDA(big, np.ones(100000, np.float32))
    s1.nda_vals["m"], s2.nda_vals["m"] = b1, b2
    assert s1._key() != s2._key()
    assert len(repr(s1._key())) < 4096
