"""MonotonicCheck / FreshnessCheck (stages/temporal.py), composite-key
UniqueCheck, and safe_join full_outer."""

import numpy as np
import pyarrow as pa
import pytest

from datatest_ray.stages.base import RunContext


def _ds(table):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _collect(ds):
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if not batches:
        return None
    return pa.concat_tables(batches)


class TestMonotonicCheck:
    def test_flags_backward_steps_per_group(self, ray_session):
        from datatest_ray.stages.temporal import MonotonicCheck

        ds = _ds({
            "g": [1, 1, 1, 2, 2, 2],
            "o": [10, 20, 30, 10, 20, 30],
            "v": [1.0, 3.0, 2.0, 5.0, 5.0, 4.0],
            "id": [1, 2, 3, 4, 5, 6],
        })
        t = _collect(
            MonotonicCheck("g", "o", "v", "id").violations(ds, RunContext())
        ).sort_by("row_ref")
        assert t.column("row_ref").to_pylist() == ["3", "6"]
        assert t.column("value_num").to_pylist() == [2.0, 4.0]
        assert t.column("expected_num").to_pylist() == [3.0, 5.0]
        assert t.column("deviation").to_pylist() == [-1.0, -1.0]
        assert set(t.column("kind").to_pylist()) == {"deviation"}

    def test_group_boundary_never_compares_across_groups(self, ray_session):
        from datatest_ray.stages.temporal import MonotonicCheck

        # group 2 starts below group 1's last value — not a violation
        ds = _ds({"g": [1, 1, 2, 2], "o": [1, 2, 1, 2],
                  "v": [1.0, 9.0, 0.5, 0.7], "id": [1, 2, 3, 4]})
        t = _collect(
            MonotonicCheck("g", "o", "v", "id").violations(ds, RunContext()))
        assert t is None or t.num_rows == 0

    def test_ties_on_order_break_by_id(self, ray_session):
        from datatest_ray.stages.temporal import MonotonicCheck

        # same o=10: order is id 1 (v=5) then id 2 (v=3) -> one violation
        ds = _ds({"g": [1, 1], "o": [10, 10], "v": [5.0, 3.0], "id": [1, 2]})
        t = _collect(
            MonotonicCheck("g", "o", "v", "id").violations(ds, RunContext()))
        assert t.column("row_ref").to_pylist() == ["2"]

    def test_non_increasing_direction(self, ray_session):
        from datatest_ray.stages.temporal import MonotonicCheck

        ds = _ds({"g": [1, 1, 1], "o": [1, 2, 3],
                  "v": [3.0, 2.0, 4.0], "id": [1, 2, 3]})
        t = _collect(MonotonicCheck(
            "g", "o", "v", "id", direction="non_increasing"
        ).violations(ds, RunContext()))
        assert t.column("row_ref").to_pylist() == ["3"]
        assert t.column("deviation").to_pylist() == [2.0]


class TestFreshnessCheck:
    def _events(self):
        base = np.datetime64("2024-01-10T00:00:00", "us")
        hours = np.array([0, 1, 2, -30, -40, 1], dtype="timedelta64[h]")
        return _ds({
            "g": [1, 1, 2, 2, 3, 4],
            "ts": pa.array(base + hours.astype("timedelta64[us]")),
        })

    def test_stale_groups_flagged_with_lag_seconds(self, ray_session):
        from datatest_ray.stages.temporal import FreshnessCheck

        # global max = base+2h; group 2 max = base+2h (fresh); group 3
        # max = base-40h (38h stale); group 4 = base+1h (1h, fresh)
        t = _collect(FreshnessCheck("g", "ts", max_lag_s=2 * 3600.0)
                     .violations(self._events(), RunContext()))
        assert t.column("key").to_pylist() == ["3"]
        assert t.column("value_num").to_pylist() == [42 * 3600.0]
        assert t.column("deviation").to_pylist() == [40 * 3600.0]
        assert t.column("value").to_pylist() == ["2024-01-08 08:00:00"]

    def test_all_fresh_is_empty_with_schema(self, ray_session):
        from datatest_ray.differences import VIOLATION_SCHEMA
        from datatest_ray.stages.temporal import FreshnessCheck

        out = FreshnessCheck("g", "ts", max_lag_s=100 * 3600.0).violations(
            self._events(), RunContext())
        t = _collect(out)
        assert t is None or t.num_rows == 0
        sch = out.schema()
        assert list(getattr(sch, "names", [])) == VIOLATION_SCHEMA.names


class TestCompositeUnique:
    def test_composite_key_duplicates(self, ray_session):
        from datatest_ray.stages.global_checks import UniqueCheck

        ds = _ds({"a": [1, 1, 1, 2, 2], "b": ["x", "x", "y", "x", "x"]})
        t = _collect(UniqueCheck(["a", "b"]).violations(ds, RunContext()))
        t = t.sort_by("value")
        assert t.column("value").to_pylist() == ["1|x", "2|x"]
        assert t.column("deviation").to_pylist() == [1.0, 1.0]
        assert set(t.column("kind").to_pylist()) == {"extra"}

    def test_single_column_path_unchanged(self, ray_session):
        from datatest_ray.stages.global_checks import UniqueCheck

        ds = _ds({"a": [1, 2, 2, 3, 3, 3]})
        t = _collect(UniqueCheck("a").violations(ds, RunContext()))
        t = t.sort_by("value")
        assert t.column("value").to_pylist() == ["2", "3"]
        assert t.column("deviation").to_pylist() == [1.0, 2.0]


class TestFullOuterJoin:
    def test_unmatched_rows_survive_both_sides(self, ray_session):
        from datatest_ray.stages.relational import safe_join

        l = _ds({"lk": [1, 2, 3], "lv": [10, 20, 30]})
        r = _ds({"rk": [2, 3, 4], "rv": [200, 300, 400]})
        t = _collect(safe_join(l, r, join_type="full_outer",
                               num_partitions=4, on="lk", right_on="rk"))
        t = t.sort_by("lk")
        assert t.column("lk").to_pylist() == [1, 2, 3, 4]
        assert t.column("lv").to_pylist() == [10, 20, 30, None]
        assert t.column("rv").to_pylist() == [None, 200, 300, 400]

    def test_empty_right_side(self, ray_session):
        import pyarrow.compute as pc

        from datatest_ray.stages.relational import safe_join

        l = _ds({"lk": [1, 2], "lv": [10, 20]})
        r_tbl = pa.table({"rk": pa.array([], pa.int64()),
                          "rv": pa.array([], pa.int64())})
        import ray.data as rd

        t = _collect(safe_join(l, rd.from_arrow(r_tbl),
                               join_type="full_outer",
                               num_partitions=4, on="lk", right_on="rk"))
        t = t.sort_by("lk")
        assert t.column("lk").to_pylist() == [1, 2]
        assert pc.all(pc.is_null(t.column("rv"))).as_py() in (True, None)


class TestGroupSizeCheck:
    def test_bounds_flag_low_and_high(self, ray_session):
        from datatest_ray.stages.global_checks import GroupSizeCheck

        ds = _ds({"g": ["a"] * 1 + ["b"] * 3 + ["c"] * 6})
        t = _collect(GroupSizeCheck("g", min_rows=2, max_rows=4)
                     .violations(ds, RunContext()))
        t = t.sort_by("key")
        assert t.column("key").to_pylist() == ["a", "c"]
        assert t.column("value_num").to_pylist() == [1.0, 6.0]
        assert t.column("expected_num").to_pylist() == [2.0, 4.0]
        assert t.column("deviation").to_pylist() == [-1.0, 2.0]

    def test_unbounded_max(self, ray_session):
        from datatest_ray.stages.global_checks import GroupSizeCheck

        ds = _ds({"g": ["a", "b", "b"]})
        t = _collect(GroupSizeCheck("g", min_rows=2)
                     .violations(ds, RunContext()))
        assert t.column("key").to_pylist() == ["a"]

    def test_all_in_bounds_empty(self, ray_session):
        from datatest_ray.stages.global_checks import GroupSizeCheck

        ds = _ds({"g": ["a", "a", "b", "b"]})
        t = _collect(GroupSizeCheck("g", min_rows=1, max_rows=5)
                     .violations(ds, RunContext()))
        assert t is None or t.num_rows == 0


class TestSequenceContiguityCheck:
    def test_gap_dup_and_offset_flagged(self, ray_session):
        from datatest_ray.stages.temporal import SequenceContiguityCheck

        ds = _ds({
            "g": ["ok", "ok", "gap", "gap", "dup", "dup", "off", "off"],
            "s": [1, 2, 1, 3, 2, 2, 2, 3],
        })
        t = _collect(SequenceContiguityCheck("g", "s")
                     .violations(ds, RunContext())).sort_by("key")
        assert t.column("key").to_pylist() == ["dup", "gap", "off"]
        # dup: n=2 max=2 but min!=1; gap: n=2 max=3; off: n=2 max=3 min=2
        got = dict(zip(t.column("key").to_pylist(),
                       zip(t.column("value_num").to_pylist(),
                           t.column("expected_num").to_pylist())))
        assert got["gap"] == (2.0, 3.0)
        assert got["dup"] == (2.0, 2.0)
        assert got["off"] == (2.0, 3.0)

    def test_contiguous_groups_pass(self, ray_session):
        from datatest_ray.stages.temporal import SequenceContiguityCheck

        ds = _ds({"g": ["a", "a", "a", "b"], "s": [1, 2, 3, 1]})
        t = _collect(SequenceContiguityCheck("g", "s")
                     .violations(ds, RunContext()))
        assert t is None or t.num_rows == 0


class TestNewChecksInSuite:
    def test_suite_runs_all_new_checks_with_pruned_reader(self, ray_session):
        import numpy as np
        import ray.data as rd

        from datatest_ray import (CheckSuite, FreshnessCheck,
                                  GroupSizeCheck, MonotonicCheck,
                                  RunContext, SequenceContiguityCheck)

        base = np.datetime64("2024-01-10T00:00:00", "us")
        hours = np.array([0, 1, 2, -30, -40, 1],
                         dtype="timedelta64[h]").astype("timedelta64[us]")
        tbl = pa.table({
            "g": [1, 1, 2, 2, 3, 4],
            "ts": pa.array(base + hours),
            "v": [1.0, 0.5, 2.0, 3.0, 1.0, 1.0],
            "id": [1, 2, 3, 4, 5, 6],
            "seq": [1, 3, 1, 2, 1, 2],
        })
        suite = CheckSuite(
            [MonotonicCheck("g", "ts", "v", "id"),
             FreshnessCheck("g", "ts", max_lag_s=2 * 3600.0),
             GroupSizeCheck("g", min_rows=2),
             SequenceContiguityCheck("g", "seq")],
            RunContext(),
        )
        reads = []

        def reader(cols):
            reads.append(sorted(cols))
            return rd.from_arrow(tbl.select(cols))

        res = suite.run(rd.from_arrow(tbl), reader=reader)
        t = res.to_table()
        by_check = {}
        for cid in t.column("check_id").to_pylist():
            by_check[cid] = by_check.get(cid, 0) + 1
        assert len(by_check) == 4          # every check fired
        # read-level pruning asked only for each check's columns
        assert all(set(c) <= {"g", "ts", "v", "id", "seq"} for c in reads)
        assert any(set(c) == {"g", "ts"} for c in reads)  # freshness


class TestKAnonymityAndSentinel:
    def test_composite_group_size(self, ray_session):
        from datatest_ray.stages.global_checks import GroupSizeCheck

        ds = _ds({"a": [1, 1, 1, 2], "b": ["x", "x", "y", "y"]})
        t = _collect(GroupSizeCheck(["a", "b"], min_rows=2)
                     .violations(ds, RunContext())).sort_by("key")
        assert t.column("key").to_pylist() == ["1|y", "2|y"]
        assert t.column("value_num").to_pylist() == [1.0, 1.0]

    def test_sentinel_report_shares_and_tiebreak(self, ray_session):
        from datatest_ray.stages.profile import sentinel_value_report

        ds = _ds({
            "a": ["N/A", "N/A", "N/A", "z", None],
            "b": [1, 1, 2, 2, 3],   # tie 1 vs 2 -> smaller string "1"
        })
        t = _collect(sentinel_value_report(ds, ["a", "b"])).sort_by(
            "column")
        got = {r["column"]: r for r in t.to_pylist()}
        assert got["a"]["top_value"] == "N/A"
        assert got["a"]["n_top"] == 3 and got["a"]["n_nonnull"] == 4
        assert abs(got["a"]["share"] - 0.75) < 1e-12
        assert got["b"]["top_value"] == "1"
