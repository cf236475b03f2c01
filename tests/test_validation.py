"""``validate()`` / ``valid()`` dispatch parity (mirrors upstream
tests/test_validation.py per SURVEY.md §5.1 / FIXTURES.md §F2 — exact
difference lists, not counts)."""

import re

import pandas as pd
import pytest

from datatest_ray import (
    Deviation,
    Extra,
    Invalid,
    Missing,
    ValidationError,
    valid,
    validate,
)


def diffs_of(fn, *args, **kwargs):
    with pytest.raises(ValidationError) as e:
        fn(*args, **kwargs)
    return e.value.differences


def test_set_requirement():
    # FIXTURES.md t_set
    got = diffs_of(validate, ["x", "x", "y", "y", "z"], {"x", "y", "w"})
    assert got == [Extra("z"), Missing("w")]
    validate(["x", "y"], {"x", "y"})  # passes


def test_predicate_function():
    got = diffs_of(validate, [2, 4, 5], lambda v: v % 2 == 0)
    assert got == [Invalid(5)]


def test_type_requirement():
    got = diffs_of(validate, [1, "2", 3], int)
    assert got == [Invalid("2")]


def test_regex_requirement():
    got = diffs_of(validate, ["foo1", "bar", "foo2"], re.compile(r"^foo\d$"))
    assert got == [Invalid("bar")]


def test_scalar_string():
    got = diffs_of(validate, ["a", "b", "a"], "a")
    assert got == [Invalid("b", "a")]


def test_scalar_number_gives_deviation():
    got = diffs_of(validate, [10, 12, 10], 10)
    assert got == [Deviation(2, 10)]


def test_tuple_requirement():
    rows = [("a", 1, None), ("b", "oops", 2), ("c", 3, "x")]
    got = diffs_of(validate, rows, (str, int, ...))
    assert got == [Invalid(("b", "oops", 2))]


def test_bool_requirement():
    got = diffs_of(validate, [1, 0, "x", ""], True)
    assert got == [Invalid(0), Invalid("")]


def test_list_requirement_order():
    got = diffs_of(validate, ["a", "b", "x"], ["a", "b", "c"])
    assert got == [Extra((2, "x")), Missing((2, "c"))]


def test_mapping_data_and_requirement():
    data = {"k1": [1, 2], "k2": ["x", "q"]}
    req = {"k1": int, "k2": {"x", "y"}}
    got = diffs_of(validate, data, req)
    assert got == {"k2": [Extra("q"), Missing("y")]}


def test_mapping_missing_key():
    got = diffs_of(validate, {"k1": 1}, {"k1": 1, "k2": 2})
    assert got == {"k2": [Missing(2)]}


def test_valid_returns_bool():
    assert valid(["x"], {"x"})
    assert not valid(["x", "z"], {"x"})


def test_msg_is_description():
    with pytest.raises(ValidationError) as e:
        validate([1], 2, msg="custom message")
    assert e.value.description == "custom message"


def test_pandas_series():
    got = diffs_of(validate, pd.Series(["a", "b"]), {"a"})
    assert got == [Extra("b")]


def test_pandas_dataframe_rows():
    df = pd.DataFrame({"x": ["a", "b"], "y": [1, "bad"]})
    got = diffs_of(validate, df, (str, int))
    assert got == [Invalid(("b", "bad"))]


def test_nan_requirement():
    nan = float("nan")
    validate([nan, nan], nan)  # NaN == NaN per reference semantics
    got = diffs_of(validate, [1.0, nan], nan)
    assert got == [Invalid(1.0, nan)]


# ---- explicit method variants (reference validate.<name>) --------------


def test_validate_interval():
    # FIXTURES.md t_interval
    got = diffs_of(validate.interval, [1, 5, 10, 12, -2], min=0, max=10)
    assert got == [Deviation(2, 10), Deviation(-2, 0)]


def test_validate_approx():
    validate.approx([1.00000001], 1.0)
    got = diffs_of(validate.approx, [1.5], 1.0)
    assert got == [Deviation(0.5, 1.0)]
    validate.approx([1.4], 1.0, delta=0.5)


def test_validate_fuzzy():
    validate.fuzzy(["color"], "colour", cutoff=0.6)
    got = diffs_of(validate.fuzzy, ["xyz"], "colour", cutoff=0.6)
    assert got == [Invalid("xyz", "colour")]


def test_validate_subset_superset_orientation():
    # FIXTURES.md t_subset / t_superset: pins the final upstream
    # orientation (data vs requirement) per SURVEY.md §2.B7
    validate.subset(["a", "b"], {"a", "b", "c"})
    got = diffs_of(validate.subset, ["a", "d"], {"a", "b", "c"})
    assert got == [Extra("d")]
    validate.superset(["a", "b", "c"], {"a", "b"})
    got = diffs_of(validate.superset, ["a", "b"], {"a", "b", "c"})
    assert got == [Missing("c")]


def test_validate_unique():
    # FIXTURES.md t_unique
    got = diffs_of(validate.unique, ["a", "b", "a", "c", "b", "a"])
    assert got == [Extra("a"), Extra("b"), Extra("a")]


def test_validate_regex_method():
    got = diffs_of(validate.regex, ["foo1", "bar"], r"^foo\d$")
    assert got == [Invalid("bar")]


def test_validate_set_method():
    got = diffs_of(validate.set, ["x", "z"], {"x", "y"})
    assert got == [Extra("z"), Missing("y")]
