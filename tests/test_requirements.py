"""Distributed check parity (mirrors upstream tests/test_requirements.py
per SURVEY.md §5.1): each check class run over a ray.data.Dataset, with
exact expected difference lists via ``differences_from_table``."""

import re

import pyarrow as pa
import pytest

import datatest_ray as dr
from datatest_ray import (
    ApproxCheck,
    CheckSuite,
    Deviation,
    DomainCheck,
    Extra,
    FuzzyCheck,
    IntervalCheck,
    Invalid,
    Missing,
    PredicateCheck,
    RegexCheck,
    RunContext,
    SchemaCheck,
    SetCheck,
    SubsetCheck,
    SupersetCheck,
    TupleCheck,
    UniqueCheck,
    ValidationError,
    validate,
)


def ds_of(**cols):
    import ray.data as rd

    return rd.from_arrow(pa.table(cols))


def run_diffs(check, ds, **ctx):
    result = CheckSuite([check], RunContext(**ctx)).run(ds)
    return sorted(result.differences(), key=repr)


def test_interval_check(ray_session):
    # FIXTURES.md t_interval
    ds = ds_of(v=[1, 5, 10, 12, -2])
    got = run_diffs(IntervalCheck("v", min=0, max=10), ds)
    assert got == sorted([Deviation(2, 10), Deviation(-2, 0)], key=repr)


def test_interval_nulls_invalid(ray_session):
    ds = ds_of(v=pa.array([1, None, 5], pa.int64()))
    got = run_diffs(IntervalCheck("v", min=0, max=10), ds)
    assert got == [Invalid(None)]


def test_regex_check(ray_session):
    # FIXTURES.md t_regex
    ds = ds_of(s=["foo1", "bar", "foo2"])
    got = run_diffs(RegexCheck("s", r"^foo\d$"), ds)
    assert got == [Invalid("bar")]


def test_predicate_check_numeric_deviation(ray_session):
    ds = ds_of(v=[10, 12, 10])
    got = run_diffs(PredicateCheck("v", 10), ds)
    assert got == [Deviation(2, 10)]


def test_predicate_check_callable(ray_session):
    ds = ds_of(v=[2, 4, 5])
    got = run_diffs(PredicateCheck("v", lambda x: x % 2 == 0), ds)
    assert got == [Invalid(5)]


def test_set_check(ray_session):
    # FIXTURES.md t_set
    ds = ds_of(a=["x", "x", "y", "y", "z"])
    got = run_diffs(SetCheck("a", {"x", "y", "w"}), ds)
    assert got == sorted([Extra("z"), Missing("w")], key=repr)


def test_subset_check_literal(ray_session):
    ds = ds_of(a=["a", "d"])
    got = run_diffs(SubsetCheck("a", {"a", "b", "c"}), ds)
    assert got == [Extra("d")]


def test_subset_check_referential(ray_session):
    data = ds_of(fk=[1, 2, 3, 99])
    ref = ds_of(pk=[1, 2, 3, 4])
    got = run_diffs(SubsetCheck("fk", (ref, "pk")), data)
    assert got == [Extra(99)]


def test_superset_check_literal(ray_session):
    ds = ds_of(a=["a", "b"])
    got = run_diffs(SupersetCheck("a", {"a", "b", "c"}), ds)
    assert got == [Missing("c")]


def test_superset_check_referential(ray_session):
    data = ds_of(a=[1, 2])
    ref = ds_of(b=[1, 2, 3])
    got = run_diffs(SupersetCheck("a", (ref, "b")), data)
    assert got == [Missing(3)]


def test_unique_check_per_occurrence(ray_session):
    # FIXTURES.md t_unique (multiset parity)
    ds = ds_of(k=["a", "b", "a", "c", "b", "a"])
    got = run_diffs(UniqueCheck("k", emit="per_occurrence"), ds)
    assert got == sorted([Extra("a"), Extra("a"), Extra("b")], key=repr)


def test_unique_check_per_value(ray_session):
    ds = ds_of(k=["a", "b", "a", "c", "b", "a"])
    result = CheckSuite([UniqueCheck("k")]).run(ds)
    t = result.to_table()
    rows = sorted(
        zip(t.column("value").to_pylist(), t.column("deviation").to_pylist())
    )
    assert rows == [("a", 2.0), ("b", 1.0)]


def test_tuple_check(ray_session):
    # FIXTURES.md t_tuple
    ds = ds_of(x=["a", "b", "c"], y=[1, None, 3], z=[None, "oops", "x"])
    ds2 = ds_of(x=["a", "b", "c"], y=pa.array([1, 2, 3]), z=["p", "q", "r"])
    got = run_diffs(TupleCheck(["x", "y"], (str, int)), ds2)
    assert got == []
    ds3 = ds_of(x=["a", "b"], y=pa.array(["1", "oops"]))
    got = run_diffs(TupleCheck(["x", "y"], (str, int)), ds3)
    assert len(got) == 2  # neither '1' nor 'oops' is an int


def test_domain_check_rows(ray_session):
    ds = ds_of(fmt=["jpeg", "png", "jpg ", "jpeg"])
    got = run_diffs(DomainCheck("fmt", {"jpeg", "png", "webp"}), ds)
    assert got == [Extra("jpg ")]


def test_approx_check(ray_session):
    ds = ds_of(v=[1.0, 1.00000001, 1.5])
    got = run_diffs(ApproxCheck("v", 1.0), ds)
    assert got == [Deviation(0.5, 1.0)]


def test_fuzzy_check(ray_session):
    ds = ds_of(s=["colour", "color", "xyz"])
    got = run_diffs(FuzzyCheck("s", "colour", cutoff=0.6), ds)
    assert got == [Invalid("xyz", "colour")]


def test_schema_check(ray_session):
    ds = ds_of(a=[1], b=["x"])
    got = run_diffs(SchemaCheck({"a": int, "b": str}), ds)
    assert got == []
    got = run_diffs(SchemaCheck({"a": str, "c": int}), ds)
    assert len(got) == 2  # a: wrong type; c: missing
    kinds = {type(d) for d in got}
    assert kinds == {Invalid, Missing}


def test_fused_suite_multiple_checks(ray_session):
    ds = ds_of(
        w=[100, 0, 300], fmt=["jpeg", "jpg ", "png"], cap=["ok one", "", "fine"]
    )
    suite = CheckSuite(
        [
            IntervalCheck("w", min=1, max=16384),
            DomainCheck("fmt", {"jpeg", "png", "webp"}),
            RegexCheck("cap", r"^[A-Za-z0-9 ,.'-]+$"),
        ]
    )
    result = suite.run(ds)
    counts = result.counts()
    assert counts["interval(w,1,16384)"] == 1
    assert counts["domain(fmt,3 allowed)"] == 1
    assert counts["regex(cap,\"^[A-Za-z0-9 ,.'-]+$\")"] == 1
    assert not result.is_valid
    with pytest.raises(ValidationError):
        result.raise_on_failure()


def test_lineage_columns(ray_session):
    ds = ds_of(
        image_id=["i1", "i2"], part=["p0", "p1"], w=[5, 50000]
    )
    suite = CheckSuite(
        [IntervalCheck("w", min=1, max=16384)],
        RunContext(partition_col="part", row_ref_col="image_id"),
    )
    t = suite.run(ds).to_table()
    assert t.column("row_ref").to_pylist() == ["i2"]
    assert t.column("partition_id").to_pylist() == ["p1"]


def test_verdicts(ray_session):
    ds = ds_of(part=["p0", "p0", "p1"], w=[5, 7, -1])
    suite = CheckSuite(
        [IntervalCheck("w", min=0, max=10), RegexCheck("part", r"^p")],
        RunContext(partition_col="part"),
    )
    v = suite.run(ds).verdicts(partitions=["p0", "p1"])
    rows = {
        (r["check_id"], r["partition_id"]): (r["passed"], r["n_violations"])
        for r in v.to_pylist()
    }
    assert rows[("interval(w,0,10)", "p1")] == (False, 1)
    assert rows[("interval(w,0,10)", "p0")] == (True, 0)
    assert rows[("regex(part,'^p')", "p0")] == (True, 0)


def test_validate_on_dataset(ray_session):
    ds = ds_of(fmt=["jpeg", "bad"], w=[10, 20])
    with pytest.raises(ValidationError) as e:
        validate(ds, {"fmt": {"jpeg", "png"}, "w": int})
    assert Extra("bad") in e.value.differences
    validate(ds_of(a=[1, 2]), lambda v: v > 0)


def test_callable_returning_difference_objects(ray_session):
    """Reference parity (RequiredPredicate): a callable requirement may
    RETURN a difference object, used verbatim as the violation."""
    import pyarrow as pa
    import ray.data as rd

    from datatest_ray import CheckSuite, Deviation, Invalid, PredicateCheck, RunContext

    def req(v):
        if v == 10:
            return True
        if v < 0:
            return Invalid(v, "non-negative")
        return Deviation(v - 10, 10)

    ds = rd.from_arrow(pa.table({"v": [10, -2, 13, 10]}))
    out = CheckSuite([PredicateCheck("v", req, check_id="custom")],
                     RunContext()).run(ds).to_table()
    rows = {(k, v): (e, d) for k, v, e, d in zip(
        out.column("kind").to_pylist(), out.column("value").to_pylist(),
        out.column("expected").to_pylist(), out.column("deviation").to_pylist())}
    assert len(rows) == 2
    assert rows[("invalid", "-2")] == ("'non-negative'", None)
    assert rows[("deviation", "13")][1] == 3.0


def test_rare_category_check(ray_session):
    from datatest_ray import RareCategoryCheck

    # 'zz' has 1/21 ≈ 4.8% share; threshold 10% flags it, 60/21 each for
    # the two common categories keeps them clear.
    ds = ds_of(c=["x"] * 10 + ["y"] * 10 + ["zz"])
    result = CheckSuite([RareCategoryCheck("c", min_share=0.10)]).run(ds)
    t = result.to_table()
    assert t.column("value").to_pylist() == ["zz"]
    assert t.column("kind").to_pylist() == ["invalid"]
    assert t.column("value_num").to_pylist() == [1.0]
    dev = t.column("deviation").to_pylist()[0]
    assert abs(dev - (1 / 21 - 0.10)) < 1e-12


def test_rare_category_check_none_rare(ray_session):
    from datatest_ray import RareCategoryCheck

    ds = ds_of(c=["x", "y"] * 5)
    result = CheckSuite([RareCategoryCheck("c", min_share=0.10)]).run(ds)
    assert result.to_table().num_rows == 0


def test_completeness_check(ray_session):
    from datatest_ray import CompletenessCheck

    ds = ds_of(a=[1, None, None, 4], b=[1, 2, 3, 4])
    result = CheckSuite([CompletenessCheck(["a", "b"], max_null_share=0.25)]).run(ds)
    t = result.to_table()
    assert t.column("key").to_pylist() == ["a"]
    assert t.column("kind").to_pylist() == ["missing"]
    assert t.column("value_num").to_pylist() == [2.0]
    assert abs(t.column("deviation").to_pylist()[0] - 0.25) < 1e-12


def test_completeness_check_all_present(ray_session):
    from datatest_ray import CompletenessCheck

    ds = ds_of(a=[1, 2, 3])
    result = CheckSuite([CompletenessCheck(["a"])]).run(ds)
    assert result.to_table().num_rows == 0
