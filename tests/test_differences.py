"""Difference-object parity (mirrors upstream tests/test_differences.py
style — exact equality / repr / NaN / Deviation constraints)."""

import math

import pyarrow as pa
import pytest

from datatest_ray.differences import (
    Deviation,
    Extra,
    Invalid,
    Missing,
    NOVALUE,
    differences_from_table,
    violations_table,
)


def test_equality_by_class_and_args():
    assert Missing("x") == Missing("x")
    assert Missing("x") != Extra("x")
    assert Extra(1) == Extra(1)
    assert Invalid("a") == Invalid("a")
    assert Invalid("a", "b") == Invalid("a", "b")
    assert Invalid("a") != Invalid("a", "b")
    assert Deviation(1, 10) == Deviation(1, 10)
    assert Deviation(1, 10) != Deviation(2, 10)


def test_nan_equality():
    nan = float("nan")
    assert Missing(nan) == Missing(nan)
    assert Invalid(nan) == Invalid(nan)
    assert Deviation(nan, 10) == Deviation(nan, 10)
    assert Missing(nan) != Missing(1.0)


def test_deviation_requires_nonzero_numeric():
    with pytest.raises(ValueError):
        Deviation(0, 10)
    with pytest.raises(ValueError):
        Deviation("a", 10)
    Deviation(float("nan"), 10)  # NaN deviation allowed


def test_repr():
    assert repr(Missing("x")) == "Missing('x')"
    assert repr(Extra(3)) == "Extra(3)"
    assert repr(Invalid("a")) == "Invalid('a')"
    assert repr(Invalid("a", expected="b")) == "Invalid('a', expected='b')"
    assert repr(Deviation(2, 10)) == "Deviation(2, 10)"


def test_hashable():
    s = {Missing("x"), Missing("x"), Extra("x")}
    assert len(s) == 2


def test_violation_roundtrip():
    t = violations_table(
        2, check_id="c", kind="extra", value=["a", "b"]
    )
    assert differences_from_table(t) == [Extra("a"), Extra("b")]
    t = violations_table(
        1, check_id="c", kind="deviation", deviation=2.0,
        expected="10", expected_num=10.0,
    )
    assert differences_from_table(t) == [Deviation(2.0, 10)]
