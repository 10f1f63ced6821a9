"""Config/NESI-equivalent tests: typed init, polymorphism, unused-arg errors.

Models the reference's test_nesi suite (test_nesi.cc:170): dummy config
structs initialized from lexp, error cases with pinned messages.
"""

from typing import Optional

import pytest

from boda_tpu.core.config import Attr, Config, register
from boda_tpu.core.dims import Dims
from boda_tpu.core.error import RtErr
from boda_tpu.core.has_main import HasMain, create_and_run_has_main, mode
from boda_tpu.core.lexp import NameValScope, parse_lexp


class Vst(Config):
    u = Attr(int, default=5, help="an int")
    f = Attr(float, default=0.5)
    s = Attr(str, default="hi")
    b = Attr(bool, default=False)
    li = Attr(list[int], default=None)
    m = Attr(dict[str, int], default=None)
    dims = Attr(Dims, default=None)
    os = Attr(Optional[str], default=None)


class SubVst(Config):
    name = Attr(str, req=True)
    inner = Attr(Vst, default=None)


def test_defaults():
    v = Vst.init_from_lexp("()")
    assert (v.u, v.f, v.s, v.b, v.li, v.os) == (5, 0.5, "hi", False, None, None)


def test_init_all():
    v = Vst.init_from_lexp("(u=7,f=1.5,s=yo,b=1,li=(1,2,3),m=(a=1,b=2),dims=(dims=(y=2,x=3)),os=x)")
    assert v.u == 7 and v.f == 1.5 and v.s == "yo" and v.b is True
    assert v.li == [1, 2, 3] and v.m == {"a": 1, "b": 2}
    assert v.dims == Dims.make(y=2, x=3) and v.os == "x"


def test_list_shorthand():
    v = Vst.init_from_lexp("(li=8 8)")
    assert v.li == [8, 8]
    v = Vst.init_from_lexp("(li=8:16)")
    assert v.li == [8, 16]


def test_nested_and_required():
    s = SubVst.init_from_lexp("(name=n1,inner=(u=9))")
    assert s.name == "n1" and s.inner.u == 9
    with pytest.raises(RtErr) as ei:
        SubVst.init_from_lexp("(inner=(u=9))")
    assert "missing required value for 'name'" in str(ei.value)


def test_unused_arg_error():
    with pytest.raises(RtErr) as ei:
        Vst.init_from_lexp("(u=7,nosuch=1)")
    assert "unused config value(s): nosuch" in str(ei.value)
    with pytest.raises(RtErr) as ei:
        SubVst.init_from_lexp("(name=n,inner=(u=1,zz=(deep=1)))")
    assert "inner.zz" in str(ei.value)


def test_bad_scalar_errors():
    with pytest.raises(RtErr) as ei:
        Vst.init_from_lexp("(u=xyz)")
    assert "can't parse 'xyz' as int" in str(ei.value)
    with pytest.raises(RtErr) as ei:
        Vst.init_from_lexp("(b=maybe)")
    assert "as bool" in str(ei.value)


def test_interpolation_from_scope():
    parent = NameValScope()
    parent.insert_leaf("base_dir", "/tmp/models")
    v = Vst.init_from_lexp(parse_lexp("(s=%(base_dir)/net.txt)"), parent=parent)
    assert v.s == "/tmp/models/net.txt"


# polymorphic dispatch
class BeBase(Config):
    TID_KEY = "be"
    common = Attr(int, default=1)


@register(BeBase, "alpha")
class BeAlpha(BeBase):
    a = Attr(int, default=10)


@register(BeBase, "beta")
class BeBeta(BeBase):
    b = Attr(str, default="z")


class UsesBe(Config):
    be = Attr(BeBase, default="alpha")


def test_polymorphic():
    u = UsesBe.init_from_lexp("(be=(be=beta,b=q,common=3))")
    assert isinstance(u.be, BeBeta) and u.be.b == "q" and u.be.common == 3
    # leaf shorthand selects type with defaults
    u2 = UsesBe.init_from_lexp("(be=alpha)")
    assert isinstance(u2.be, BeAlpha) and u2.be.a == 10
    # default applies
    u3 = UsesBe.init_from_lexp("()")
    assert isinstance(u3.be, BeAlpha)
    with pytest.raises(RtErr) as ei:
        UsesBe.init_from_lexp("(be=(be=gamma))")
    assert "unknown be 'gamma'" in str(ei.value)


def test_help():
    h = UsesBe.help_str()
    assert "--be" in h
    h2 = BeBase.help_str()
    assert "alpha" in h2 and "beta" in h2 and "concrete types" in h2


# mode dispatch
@mode("_test_echo", help="test mode")
class _TestEcho(HasMain):
    msg = Attr(str, default="d")

    def main(self):
        self.ran = self.msg


def test_mode_dispatch():
    hm = create_and_run_has_main("(mode=_test_echo,msg=hello)", global_vars={})
    assert hm.ran == "hello"
    with pytest.raises(RtErr) as ei:
        create_and_run_has_main("(mode=_no_such_mode)", global_vars={})
    assert "unknown mode" in str(ei.value)
    with pytest.raises(RtErr) as ei:
        create_and_run_has_main("()", global_vars={})
    assert "missing required type-selector 'mode='" in str(ei.value)


def test_global_vars_scope():
    hm = create_and_run_has_main("(mode=_test_echo,msg=%(site)/x)", global_vars={"site": "S"})
    assert hm.ran == "S/x"
