"""§2.G integration surfaces: working_directory, register_accessors,
compare_datasets."""

import os

import pyarrow as pa
import pytest


def test_working_directory(tmp_path):
    from datatest_ray import working_directory

    before = os.getcwd()
    with working_directory(str(tmp_path)):
        assert os.getcwd() == str(tmp_path)
    assert os.getcwd() == before

    # file path -> its parent; decorator form
    f = tmp_path / "fixture.csv"
    f.write_text("x\n1\n")

    @working_directory(str(f))
    def inside():
        return os.getcwd()

    assert inside() == str(tmp_path)
    assert os.getcwd() == before

    # directory with a dot in its name is used as-is, not its parent
    dotted = tmp_path / "v1.2"
    dotted.mkdir()
    with working_directory(str(dotted)):
        assert os.getcwd() == str(dotted)
    assert os.getcwd() == before


def test_register_accessors(ray_session):
    import ray.data as rd

    from datatest_ray import ValidationError, register_accessors

    register_accessors()
    ds = rd.from_arrow(pa.table({"a": [1, 2, 3]}))
    assert ds.valid({"a": int})
    with pytest.raises(ValidationError):
        ds.validate({"a": {1, 2}})  # 3 is Extra


def test_compare_datasets(ray_session):
    import ray.data as rd

    from datatest_ray import IntervalCheck, compare_datasets

    a = rd.from_arrow(pa.table({"v": [1.0, 2.0, 3.0]}))
    b = rd.from_arrow(pa.table({"v": [1.0, 2.0, 99.0]}))
    out = compare_datasets([IntervalCheck("v", min=0, max=10)], a, b)
    (info,) = out.values()
    assert info == {"a": 0, "b": 1, "equal": False}


class TestSuiteSpec:
    SPEC = {
        "row_ref_col": "event_id",
        "partition_col": None,
        "checks": [
            {"type": "interval", "column": "value", "min": 0, "max": 95},
            {"type": "regex", "column": "event_type",
             "pattern": "^(click|view)$"},
            {"type": "domain", "column": "event_type",
             "allowed": ["click", "view"]},
            {"type": "unique", "column": ["user_id", "event_type"]},
            {"type": "group_size", "column": "user_id", "min_rows": 2},
            {"type": "monotonic", "by": "user_id", "order_col": "ts",
             "value_col": "value", "id_col": "event_id"},
            {"type": "freshness", "group_col": "user_id", "column": "ts",
             "max_lag_s": 86400.0},
            {"type": "seq_contiguous", "group_col": "user_id",
             "seq_col": "event_id"},
            {"type": "completeness", "columns": ["value"],
             "max_null_share": 0.1},
            {"type": "schema", "columns": {"value": "float"}},
        ],
    }

    def test_roundtrip(self):
        from datatest_ray.pipelines.spec import suite_from_spec, suite_to_spec

        suite = suite_from_spec(self.SPEC)
        assert len(suite.checks) == 10
        assert suite.ctx.row_ref_col == "event_id"
        spec2 = suite_to_spec(suite)
        suite2 = suite_from_spec(spec2)
        assert suite_to_spec(suite2) == spec2
        # every check type survived with its parameters
        types = [c["type"] for c in spec2["checks"]]
        assert types == [c["type"] for c in self.SPEC["checks"]]

    def test_file_roundtrip_and_run(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from datatest_ray.pipelines.spec import (dump_suite, load_suite,
                                                 suite_from_spec)

        suite = suite_from_spec(self.SPEC)
        p = str(tmp_path / "suite.json")
        dump_suite(suite, p)
        loaded = load_suite(p)
        base = np.datetime64("2024-01-10T00:00:00", "us")
        ds = rd.from_arrow(pa.table({
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 2],
            "event_type": ["click", "view", "scroll"],
            "value": [1.0, 99.0, 2.0],
            "ts": pa.array([base, base, base]),
        }))
        t = loaded.run(ds).to_table()
        assert t.num_rows > 0  # interval 99, domain/regex 'scroll', ...

    def test_unknown_type_raises(self):
        import pytest

        from datatest_ray.pipelines.spec import suite_from_spec

        with pytest.raises(ValueError, match="unknown check type"):
            suite_from_spec({"checks": [{"type": "nope"}]})
