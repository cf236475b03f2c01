"""Predicate matcher parity (mirrors upstream tests/test_predicate.py
style): every matcher form, ``~`` inversion, and the vectorized masks."""

import re

import numpy as np
import pyarrow as pa

from datatest_ray.predicate import Predicate, TuplePredicate, get_predicate


def test_set_membership():
    p = Predicate({"a", "b"})
    assert p("a") and p("b") and not p("c")
    m = p.mask(pa.array(["a", "c", "b", None]))
    assert m.tolist() == [True, False, True, False]


def test_regex():
    p = Predicate(re.compile(r"^foo\d$"))
    assert p("foo1") and not p("bar") and not p(None) and not p(3)
    m = p.mask(pa.array(["foo1", "bar", "foo22", None]))
    assert m.tolist() == [True, False, False, False]


def test_type():
    p = Predicate(int)
    assert p(3) and not p("3")
    assert p(True)  # bool is an int subclass, matching isinstance
    m = p.mask(pa.array([1, 2, None]))
    assert m.tolist() == [True, True, False]
    m = p.mask(pa.array(["a", "b"]))
    assert m.tolist() == [False, False]
    p = Predicate(float)
    assert p.mask(pa.array([1.5, 2.5])).tolist() == [True, True]
    assert p.mask(pa.array([1, 2])).tolist() == [False, False]


def test_scalar_equality_and_nan():
    p = Predicate("x")
    assert p("x") and not p("y")
    assert Predicate(5)(5) and not Predicate(5)(6)
    nan = float("nan")
    p = Predicate(nan)
    assert p(nan) and not p(1.0)
    m = p.mask(pa.array([1.0, nan, None]))
    assert m.tolist() == [False, True, False]


def test_truthiness():
    t = Predicate(True)
    assert t(1) and t("x") and not t(0) and not t("")
    f = Predicate(False)
    assert f(0) and f("") and not f(1)
    assert t.mask(pa.array([0, 1, 2])).tolist() == [False, True, True]
    assert f.mask(pa.array(["", "x"])).tolist() == [True, False]


def test_callable():
    p = Predicate(lambda v: v > 2)
    assert p(3) and not p(1)
    assert p.mask(pa.array([1, 3, 5])).tolist() == [False, True, True]


def test_wildcard():
    p = Predicate(...)
    assert p("anything") and p(None)
    assert p.mask(pa.array([1, None])).tolist() == [True, True]


def test_inversion():
    p = ~Predicate({"a", "b"})
    assert p("c") and not p("a")
    assert p.mask(pa.array(["a", "c"])).tolist() == [False, True]
    assert (~~Predicate("x"))("x")


def test_tuple_predicate():
    tp = TuplePredicate((str, int, ...))
    assert tp(("a", 1, object()))
    assert not tp((1, 1, None))
    assert not tp(("a", "b", None))
    cols = [pa.array(["a", "b"]), pa.array([1, 2]), pa.array([None, "z"])]
    assert tp.mask_columns(cols).tolist() == [True, True]


def test_get_predicate_dispatch():
    assert isinstance(get_predicate((str, int)), TuplePredicate)
    assert isinstance(get_predicate({"a"}), Predicate)
    p = Predicate("x")
    assert get_predicate(p) is p


def test_non_re2_regex_falls_back():
    # backreference: not supported by Arrow's RE2 — must fall back per-row
    p = Predicate(re.compile(r"^(a)\1$"))
    m = p.mask(pa.array(["aa", "ab"]))
    assert m.tolist() == [True, False]
