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


# ---------------------------------------------------------------------------
# Explicit-method Dataset dispatch: every validate.<name> routed to its
# distributed Check must yield the SAME difference multiset as the
# in-memory path on the same values (round-1 verdict gap #1).
# ---------------------------------------------------------------------------

_METHOD_CASES = [
    ("predicate", dict(values=[2, 4, 5], args=(lambda v: v % 2 == 0,))),
    ("regex", dict(values=["foo1", "bar", "foo2"], args=(r"^foo\d$",))),
    ("approx", dict(values=[1.0, 1.00000001, 1.5], args=(1.0,))),
    ("fuzzy", dict(values=["color", "xyz"], args=("colour",),
                   kwargs=dict(cutoff=0.6))),
    ("interval", dict(values=[0, 5, 12], kwargs=dict(min=1, max=10))),
    ("set", dict(values=["x", "x", "z"], args=({"x", "y"},))),
    ("subset", dict(values=["a", "d", "a"], args=({"a", "b", "c"},))),
    ("superset", dict(values=["a", "b"], args=({"a", "b", "c"},))),
    ("unique", dict(values=["a", "b", "a", "c", "b", "a"])),
]


def _diff_multiset(diffs):
    # the violation IR carries numerics as float64, so normalize int->
    # float before comparing (Deviation(-1, 1) == Deviation(-1.0, 1.0))
    from collections import Counter

    def norm(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, (int, float)):
            return float(v)
        return v

    return Counter(
        (type(d).__name__, repr(tuple(norm(a) for a in d.args))) for d in diffs
    )


@pytest.mark.parametrize("method,case", _METHOD_CASES,
                         ids=[m for m, _ in _METHOD_CASES])
def test_method_dataset_dispatch(ray_session, method, case):
    import ray.data as rd

    fn = getattr(validate, method)
    args = case.get("args", ())
    kwargs = case.get("kwargs", {})
    with pytest.raises(ValidationError) as e_mem:
        fn(case["values"], *args, **kwargs)
    ds = rd.from_items([{"v": v} for v in case["values"]])
    with pytest.raises(ValidationError) as e_ds:
        fn(ds, *args, columns=["v"], **kwargs)
    assert _diff_multiset(e_ds.value.differences) == _diff_multiset(
        e_mem.value.differences
    )


def test_method_dataset_dispatch_passes(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"v": 5}, {"v": 7}])
    validate.interval(ds, min=1, max=10, columns=["v"])
    validate.unique(ds, columns=["v"])
    assert valid(ds, lambda v: v > 0, columns=["v"])


def test_order_dataset_dispatch(ray_session):
    import ray.data as rd

    ds = rd.from_items(
        [{"pos": i, "v": v} for i, v in enumerate(["a", "b", "d", "e"])]
    )
    with pytest.raises(TypeError):
        validate.order(ds, ["a", "b", "c"], columns=["v"])  # no pos_col
    with pytest.raises(ValidationError) as e:
        validate.order(ds, ["a", "b", "c", "d", "e"], columns=["v"],
                       pos_col="pos")
    with pytest.raises(ValidationError) as e_mem:
        validate.order(["a", "b", "d", "e"], ["a", "b", "c", "d", "e"])
    assert _diff_multiset(e.value.differences) == _diff_multiset(
        e_mem.value.differences
    )
