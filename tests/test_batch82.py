"""Batch 82: null-pattern census, duplicate-row census (oracle parity
covered by test_oracle.py)."""

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestNullPatternCensus:
    def test_known_patterns(self, ray_session):
        from datatest_ray.stages.profile import null_pattern_census

        t = pa.table({
            "a": pa.array([1, None, None, 1, None], pa.int64()),
            "b": pa.array([1.0, 2.0, None, 4.0, None], pa.float64()),
            "c": pa.array(["x", "y", "z", None, None]),
        })
        out = {r["pattern"]: r for r in null_pattern_census(
            _ds(t), ["a", "b", "c"], k=10).take_all()}
        assert out["(none)"]["n"] == 1
        assert out["a"]["n"] == 1
        assert out["a,b,c"]["n"] == 1
        assert out["c"]["n"] == 1
        assert out["a,b"]["n"] == 1
        assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-9

    def test_clean_table_single_pattern(self, ray_session):
        from datatest_ray.stages.profile import null_pattern_census

        t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
        out = null_pattern_census(_ds(t, 1), ["a"]).take_all()
        assert len(out) == 1
        assert out[0]["pattern"] == "(none)"
        assert out[0]["share"] == 1.0


class TestDupRowCensus:
    def test_planted_duplicates(self, ray_session):
        from datatest_ray.stages.profile import dup_row_census

        rows = [(1, "a"), (2, "b"), (1, "a"), (1, "a"), (3, "c")]
        t = pa.table({
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "e": pa.array([r[1] for r in rows]),
        })
        out = dup_row_census(_ds(t), ["u", "e"]).take_all()[0]
        assert out["n_rows"] == 5
        assert out["n_distinct"] == 3
        assert out["n_dup_rows"] == 2     # two extra (1, 'a') copies
        assert out["max_multiplicity"] == 3

    def test_all_unique(self, ray_session):
        from datatest_ray.stages.profile import dup_row_census

        t = pa.table({"u": pa.array(range(50), pa.int64())})
        out = dup_row_census(_ds(t), ["u"]).take_all()[0]
        assert out["n_dup_rows"] == 0
        assert out["max_multiplicity"] == 1
