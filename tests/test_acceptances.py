"""Acceptance algebra parity (mirrors upstream tests/test_acceptances.py
style): each acceptance + ``|``/``&`` composition + the violation-table
filter path."""

import pytest

from datatest_ray import (
    Deviation,
    Extra,
    Invalid,
    Missing,
    ValidationError,
    accepted,
    validate,
    violations_table,
)


def test_accepted_instance():
    with accepted(Extra("z")):
        validate(["x", "z"], {"x"})


def test_accepted_instance_leftover():
    with pytest.raises(ValidationError) as e:
        with accepted(Extra("z")):
            validate(["x", "z", "q"], {"x"})
    assert e.value.differences == [Extra("q")]


def test_accepted_class():
    with accepted(Missing):
        validate(["x"], {"x", "w", "v"})
    with pytest.raises(ValidationError):
        with accepted(Missing):
            validate(["x", "z"], {"x", "w"})


def test_accepted_collection_consumed_one_for_one():
    # two Extra('a') in data, only one accepted -> one leftover
    with pytest.raises(ValidationError) as e:
        with accepted([Extra("a")]):
            validate.unique(["a", "a", "a"])
    assert e.value.differences == [Extra("a")]


def test_accepted_mapping_per_key():
    with accepted({"k2": [Extra("q"), Missing("y")]}):
        validate({"k1": [1], "k2": ["x", "q"]}, {"k1": int, "k2": {"x", "y"}})


def test_accepted_keys():
    with accepted.keys("k2"):
        validate({"k2": ["q"]}, {"k2": {"x"}})


def test_accepted_args():
    with accepted.args("q"):
        validate(["x", "q"], {"x"})


def test_accepted_tolerance():
    with accepted.tolerance(5):
        validate([12, 8], 10)
    with pytest.raises(ValidationError) as e:
        with accepted.tolerance(1):
            validate([12], 10)
    assert e.value.differences == [Deviation(2, 10)]


def test_accepted_tolerance_asymmetric():
    with accepted.tolerance(-1, 3):
        validate([13, 9], 10)
    with pytest.raises(ValidationError):
        with accepted.tolerance(-1, 3):
            validate([8], 10)


def test_accepted_percent():
    with accepted.percent(0.25):
        validate([12, 8], 10)
    with pytest.raises(ValidationError):
        with accepted.percent(0.1):
            validate([12], 10)


def test_accepted_fuzzy():
    with accepted.fuzzy(cutoff=0.6):
        validate(["color"], "colour")


def test_accepted_count():
    with accepted.count(2):
        validate(["q", "r", "x"], {"x"})  # Extra('q'), Extra('r')
    with pytest.raises(ValidationError) as e:
        with accepted.count(1):
            validate(["q", "r", "x"], {"x"})
    assert len(e.value.differences) == 1


def test_union_composition():
    with accepted.tolerance(2) | accepted(Extra("z")):
        validate([11, "z"], {11, "z"} - {"z"})  # placeholder no-op
    with accepted.tolerance(5) | accepted.percent(0.5):
        validate([12], 10)
    with pytest.raises(ValidationError):
        with accepted.tolerance(1) | accepted.percent(0.05):
            validate([12], 10)


def test_intersection_composition():
    with accepted(Deviation) & accepted.tolerance(5):
        validate([12], 10)
    with pytest.raises(ValidationError):
        with accepted(Missing) & accepted.tolerance(5):
            validate([12], 10)


def test_intersection_no_quota_leak():
    # `a & b` with a quota-bearing left side: a's one-shot entry must NOT
    # be consumed when b rejects, so a later difference satisfying BOTH
    # sides still matches.
    acc = accepted([Extra("a")]) & accepted.keys("k1")
    left = acc.filter({"k2": [Extra("a")], "k1": [Extra("a")]})
    assert left == {"k2": [Extra("a")]}

    # same through a nested composition on the left side
    acc = (accepted.count(1) | accepted([Extra("x")])) & accepted.keys("k1")
    left = acc.filter({"k2": [Extra("q")], "k1": [Extra("q")]})
    assert left == {"k2": [Extra("q")]}


def test_filter_violations_table():
    t = violations_table(
        3, check_id="c", kind="deviation",
        value=["12", "13", "8"], value_num=[12.0, 13.0, 8.0],
        expected="10", expected_num=10.0, deviation=[2.0, 3.0, -2.0],
    )
    left = accepted.tolerance(2).filter_violations(t)
    assert left.num_rows == 1
    assert left.column("deviation").to_pylist() == [3.0]


def test_filter_violations_count_deterministic():
    t = violations_table(
        3, check_id="c", kind="extra", partition_id=["p2", "p0", "p1"],
        value=["c", "a", "b"],
    )
    left = accepted.count(2).filter_violations(t)
    # sorted by (check, partition, ...) -> p0,p1 consumed; p2 left
    assert left.column("partition_id").to_pylist() == ["p2"]


def test_non_validation_errors_propagate():
    with pytest.raises(ZeroDivisionError):
        with accepted(Missing):
            1 / 0


def test_stateless_dataset_filter(ray_session):
    # lazy map_batches path for stateless acceptances (scale path for
    # huge violation sets); parity with the collected-table filter
    import ray.data as rd

    t = violations_table(
        4, check_id="c", kind=["deviation", "deviation", "extra", "deviation"],
        value=["12", "13", "q", "8"], value_num=[12.0, 13.0, None, 8.0],
        expected="10", expected_num=10.0,
        deviation=[2.0, 3.0, None, -2.0],
    )
    vds = rd.from_arrow(t)
    acc = accepted.tolerance(2) | accepted(Extra)
    assert acc.stateless
    left_lazy = acc.filter_violations_dataset(vds).to_pandas()
    left_table = acc.filter_violations(t)
    assert sorted(left_lazy["value"]) == sorted(
        left_table.column("value").to_pylist()
    ) == ["13"]

    pct = accepted.percent(0.25)
    left = pct.filter_violations_dataset(vds).to_pandas()
    assert sorted(left["value"]) == ["13", "q"]  # 3.0/10 > 0.25; extra kept

    # quota-bearing forms refuse to stream
    for acc in (accepted.count(1), accepted([Extra("q")]),
                accepted.count(1) | accepted(Extra)):
        assert not acc.stateless
        with pytest.raises(TypeError):
            acc.filter_violations_dataset(vds)


def test_accepts_mask_matches_per_row():
    import numpy as np

    t = violations_table(
        3, check_id="c", kind=["deviation", "invalid", "missing"],
        key=["k1", "k2", "k1"],
        value=["5", "x", "m"], value_num=[5.0, None, None],
        expected="4", expected_num=4.0, deviation=[1.0, None, None],
    )
    for acc in (accepted.tolerance(1), accepted.percent(0.5),
                accepted(Missing), accepted.keys("k1"),
                accepted(Missing) | accepted.tolerance(1),
                accepted(Missing) & accepted.keys("k1")):
        mask = acc.accepts_mask(t)
        acc.start()
        want = np.array([acc.accepts(d, key=k) for d, k in zip(
            __import__("datatest_ray").differences_from_table(t),
            t.column("key").to_pylist())])
        assert (mask == want).all(), type(acc).__name__
