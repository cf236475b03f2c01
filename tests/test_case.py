"""DataTestCase (unittest surface, SURVEY.md §2.G), the DB-API2 cursor
adapter (§2.F), and the ValidationError repr-truncation hooks (§2.D) —
mirrors upstream tests/test_case.py / test_normalize.py semantics."""

import sqlite3
import unittest

import pytest

from datatest_ray import (
    DataTestCase,
    Deviation,
    Extra,
    Invalid,
    Missing,
    ValidationError,
    validate,
)


class _Probe(DataTestCase):
    """Instantiable TestCase for driving asserts programmatically."""

    def runTest(self):  # pragma: no cover - required by TestCase API
        pass


def test_datatestcase_assert_valid():
    tc = _Probe()
    tc.assertValid([1, 2, 3], int)
    with pytest.raises(ValidationError) as e:
        tc.assertValid(["x", "z"], {"x", "y"})
    assert e.value.differences == [Extra("z"), Missing("y")]
    assert issubclass(ValidationError, AssertionError)  # unittest reports it


def test_datatestcase_method_variants():
    tc = _Probe()
    tc.assertValidInterval([2, 3], min=1, max=5)
    with pytest.raises(ValidationError) as e:
        tc.assertValidInterval([0, 7], min=1, max=5)
    assert e.value.differences == [Deviation(-1, 1), Deviation(2, 5)]
    tc.assertValidRegex(["foo1"], r"^foo\d$")
    with pytest.raises(ValidationError):
        tc.assertValidUnique(["a", "a"])
    tc.assertValidSubset(["a"], {"a", "b"})
    tc.assertValidSuperset(["a", "b"], {"a"})
    tc.assertValidApprox([1.00000001], 1.0)
    tc.assertValidFuzzy(["color"], "colour")
    tc.assertValidOrder(["a", "b"], ["a", "b"])
    with pytest.raises(ValidationError) as e:
        tc.assertValidPredicate([2, 5], lambda v: v % 2 == 0)
    assert e.value.differences == [Invalid(5)]


def test_datatestcase_accepted_helpers():
    tc = _Probe()
    with tc.acceptedTolerance(5):
        tc.assertValid([12], 10)
    with tc.accepted(Extra("z")):
        tc.assertValidSet(["x", "z"], {"x"})
    with pytest.raises(ValidationError):
        with tc.acceptedCount(1):
            tc.assertValidUnique(["a", "a", "b", "b", "b"])


def test_datatestcase_runs_under_unittest():
    class T(DataTestCase):
        def test_ok(self):
            self.assertValid([1], int)

        def test_fail(self):
            self.assertValid(["x"], {"y"})

    res = unittest.TestResult()
    unittest.defaultTestLoader.loadTestsFromTestCase(T).run(res)
    assert res.testsRun == 2
    assert len(res.failures) == 1  # ValidationError -> failure, not error
    assert len(res.errors) == 0


# ---------------------------------------------------------------------------
# DB-API2 cursor adapter
# ---------------------------------------------------------------------------


def _db():
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE t (name TEXT, qty INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [("a", 1), ("b", 2), ("z", 3)])
    return con


def test_cursor_single_column_elements():
    con = _db()
    with pytest.raises(ValidationError) as e:
        validate(con.execute("SELECT name FROM t ORDER BY name"), {"a", "b"})
    assert e.value.differences == [Extra("z")]


def test_cursor_row_tuples():
    con = _db()
    cur = con.execute("SELECT name, qty FROM t ORDER BY name")
    with pytest.raises(ValidationError) as e:
        validate(cur, (str, lambda q: q < 3))
    assert e.value.differences == [Invalid(("z", 3))]
    con.close()


def test_cursor_passes_and_is_consumed_once():
    con = _db()
    cur = con.execute("SELECT qty FROM t")
    validate(cur, int)
    assert cur.fetchall() == []  # consumed, like reference iterators


def test_read_sql_dataset_end_to_end(ray_session, tmp_path):
    # the Dataset-source equivalent (SURVEY.md §2.F: cursor -> read_sql)
    import ray.data as rd

    path = str(tmp_path / "t.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE t (name TEXT, qty INTEGER)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [("a", 1), ("b", 2), ("z", 30)])
    con.commit()
    con.close()

    ds = rd.read_sql("SELECT qty FROM t",
                     lambda: sqlite3.connect(path))
    with pytest.raises(ValidationError) as e:
        validate.interval(ds, min=1, max=10, columns=["qty"])
    assert e.value.differences == [Deviation(20.0, 10.0)]


# ---------------------------------------------------------------------------
# ValidationError truncation hooks
# ---------------------------------------------------------------------------


def test_truncation_hooks():
    diffs = [Extra(f"value-{i}") for i in range(50)]
    err = ValidationError(diffs, "demo")
    try:
        ValidationError._should_truncate = lambda lines, chars: lines > 3
        ValidationError._truncation_notice = "...output truncated"
        s = str(err)
        assert "value-0" in s and "value-2" in s
        assert "value-3" not in s
        assert "...output truncated" in s
        assert "(50 differences)" in s
    finally:
        ValidationError._should_truncate = None
        ValidationError._truncation_notice = None
    # hooks cleared -> default _max_repr elision returns
    s = str(err)
    assert "value-9" in s and "(40 more)" in s
