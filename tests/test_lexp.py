"""lexp parser tests: grammar, escapes, errors, interpolation, argv.

Models the reference's test_lexp suite (lexp.cc:668): table-driven cases
including exact expected-error substrings.
"""

import pytest

from boda_tpu.core.error import RtErr
from boda_tpu.core.lexp import (Lexp, NameValScope, get_lexp_from_argv,
                                lexp_escape, parse_lexp, str_format_from_nvm)


def rt(s):  # parse → print round trip
    return str(parse_lexp(s))


def test_leaf():
    l = parse_lexp("hello")
    assert l.is_leaf and l.leaf_val == "hello"


def test_empty_list():
    l = parse_lexp("()")
    assert not l.is_leaf and l.kids == []


def test_nested():
    l = parse_lexp("(k=v,k2=(a=1,b=2))")
    assert l.get_kid("k").leaf_val == "v"
    assert l.get_kid("k2").get_kid("b").leaf_val == "2"


def test_round_trip():
    for s in ["()", "(a=1)", "(a=1,b=(c=2,d=()))",
              "(type=sgemm,dims_vals=(a=(K=128,M=128),b=(K=128,N=128),c=(M=128,N=128)))"]:
        assert rt(s) == s


def test_escapes():
    l = parse_lexp(r"(a=1\,2,b=c\=d)")
    assert l.get_kid("a").leaf_val == "1,2"
    assert l.get_kid("b").leaf_val == "c=d"
    # round-trip re-escapes
    assert rt(r"(a=1\,2)") == r"(a=1\,2)"
    assert lexp_escape("a,b=c(d)") == r"a\,b\=c\(d\)"


def test_positional_and_trailing_comma():
    l = parse_lexp("(a,b,c)")
    assert [v.leaf_val for _, v in l.iter_kids()] == ["a", "b", "c"]
    l = parse_lexp("(a=1,)")
    assert l.get_kid("a").leaf_val == "1"


def test_values_with_spaces_and_colons():
    l = parse_lexp("(MNt=8 8,addr=tcp:host:1234)")
    assert l.get_kid("MNt").leaf_val == "8 8"
    assert l.get_kid("addr").leaf_val == "tcp:host:1234"


@pytest.mark.parametrize("s,err", [
    ("(a=1", "unexpected end of input"),
    ("(a=(b=1)", "unexpected end of input"),
    ("a)b", "trailing characters"),
    (r"abc\
"[:-1] if False else "abc\\", "unexpected end of input after escape char"),
    ("(a=1)x", "trailing characters"),
    ("(=1)", "empty name"),
])
def test_parse_errors(s, err):
    with pytest.raises(RtErr) as ei:
        parse_lexp(s)
    assert err in str(ei.value)


def test_unexpected_paren_in_leaf():
    with pytest.raises(RtErr) as ei:
        parse_lexp("(a=b(c))")
    assert "unexpected '('" in str(ei.value)


def test_use_cnt_unused():
    l = parse_lexp("(a=1,b=2)")
    l.use_cnt += 1
    l.get_kid("a").use_cnt += 1
    assert l.check_unused() == ["b"]


def test_interpolation():
    scope = NameValScope(parse_lexp("(name=world,n=3)"))
    assert str_format_from_nvm("hello %(name) x%(n) 100%%", scope) == "hello world x3 100%"
    with pytest.raises(RtErr) as ei:
        str_format_from_nvm("%(missing)", scope)
    assert "couldn't find ref 'missing'" in str(ei.value)


def test_scope_chain():
    parent = NameValScope(parse_lexp("(a=outer,b=outer)"))
    child = NameValScope(parse_lexp("(b=inner)"), parent)
    assert child.find("a").leaf_val == "outer"
    assert child.find("b").leaf_val == "inner"


def test_argv():
    l, pos = get_lexp_from_argv(["--a-b=3", "--flag", "--t=(x=1)", "positional"])
    assert l.get_kid("a_b").leaf_val == "3"
    assert l.get_kid("flag").leaf_val == "1"
    assert l.get_kid("t").get_kid("x").leaf_val == "1"
    assert pos == ["positional"]


def test_from_obj():
    l = Lexp.from_obj({"a": 1, "b": [1, 2], "c": {"d": True}})
    assert str(l) == "(a=1,b=(1,2),c=(d=1))"
