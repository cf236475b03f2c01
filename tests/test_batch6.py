"""Session-8 operator batch 6: weighted quantile, stuck-value runs,
candidate-key discovery."""

import numpy as np
import pyarrow as pa


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


class TestWeightedQuantile:
    def test_p90_matches_expansion(self, ray_session):
        from datatest_ray.stages.robust import weighted_quantile

        rng = np.random.RandomState(5)
        v = np.round(rng.uniform(1, 100, 300), 2)
        w = rng.randint(1, 9, 300)
        out = weighted_quantile(
            _ds(pa.table({"k": ["g"] * 300, "v": v,
                          "w": w.astype(np.float64)})),
            by="k", col="v", weight_col="w", q_num=9,
            q_den=10).to_pandas()
        # expand each row w times; lower p90 = smallest x with
        # cum >= 0.9*total
        exp = np.sort(np.repeat(v, w))
        cut = int(np.ceil(0.9 * len(exp)))
        want = exp[cut - 1]
        assert out.iloc[0]["wq"] == want

    def test_median_special_case_unchanged(self, ray_session):
        from datatest_ray.stages.robust import (weighted_median,
                                                weighted_quantile)

        t = pa.table({"k": ["a"] * 5, "v": [1.0, 2.0, 3.0, 4.0, 5.0],
                      "w": [1.0, 1.0, 1.0, 1.0, 1.0]})
        m = weighted_median(_ds(t), by="k", col="v",
                            weight_col="w").to_pandas()
        q = weighted_quantile(_ds(t), by="k", col="v", weight_col="w",
                              q_num=1, q_den=2).to_pandas()
        assert m.iloc[0]["wmedian"] == q.iloc[0]["wq"] == 3.0


class TestStuckRuns:
    def test_longest_run_detected(self, ray_session):
        from datatest_ray.stages.seq import stuck_runs

        # user 1: 5.0 x4 in a row then 6.0; user 2: alternating
        t = pa.table({
            "u": [1] * 5 + [2] * 4,
            "ts": pa.array(np.arange(9, dtype=np.int64) * 1000,
                           pa.timestamp("us")),
            "v": [5.0, 5.0, 5.0, 5.0, 6.0, 1.0, 2.0, 1.0, 2.0],
            "id": pa.array(np.arange(9), pa.int64()),
        })
        out = stuck_runs(_ds(t), by="u", ts="ts", value_col="v",
                         id_col="id").to_pandas().set_index("u")
        assert out.loc[1, "max_run"] == 4
        assert out.loc[1, "n_runs"] == 2
        assert out.loc[2, "max_run"] == 1
        assert out.loc[2, "n_runs"] == 4

    def test_order_by_ts_then_id(self, ray_session):
        from datatest_ray.stages.seq import stuck_runs

        # same ts: ids decide order → run of 2 (values 7,7 at ids 1,2)
        t = pa.table({
            "u": [1, 1, 1],
            "ts": pa.array([0, 0, 0], pa.timestamp("us")),
            "v": [8.0, 7.0, 7.0],
            "id": pa.array([3, 1, 2], pa.int64()),
        })
        out = stuck_runs(_ds(t), by="u", ts="ts", value_col="v",
                         id_col="id").to_pandas()
        assert out.iloc[0]["max_run"] == 2

    def test_nulls_excluded(self, ray_session):
        from datatest_ray.stages.seq import stuck_runs

        t = pa.table({
            "u": [1, 1, 1],
            "ts": pa.array([0, 1000, 2000], pa.timestamp("us")),
            "v": pa.array([5.0, None, 5.0]),
            "id": pa.array([1, 2, 3], pa.int64()),
        })
        out = stuck_runs(_ds(t), by="u", ts="ts", value_col="v",
                         id_col="id").to_pandas()
        # null removed → 5.0, 5.0 consecutive → run of 2
        assert out.iloc[0]["n_rows"] == 2
        assert out.iloc[0]["max_run"] == 2


class TestKeyCandidates:
    def test_key_vs_nonkey(self, ray_session):
        from datatest_ray.stages.profile import key_candidates

        t = pa.table({
            "a": [1, 2, 3, 4],
            "b": ["x", "x", "y", "y"],
            "c": [1, 1, 2, 2],
        })
        out = key_candidates(_ds(t), [["a"], ["b"], ["b", "c"]]
                             ).to_pandas().set_index("combo")
        assert out.loc["a", "is_key"] == 1
        assert out.loc["b", "is_key"] == 0
        assert out.loc["b", "n_distinct"] == 2
        assert out.loc["b", "dup_rows"] == 2
        assert out.loc["b+c", "n_distinct"] == 2   # (x,1) and (y,2)

    def test_null_rows_excluded_per_combo(self, ray_session):
        from datatest_ray.stages.profile import key_candidates

        t = pa.table({
            "a": pa.array([1, None, 3]),
            "b": pa.array(["x", "y", None]),
        })
        out = key_candidates(_ds(t), [["a"], ["a", "b"]]
                             ).to_pandas().set_index("combo")
        assert out.loc["a", "n_rows"] == 2
        assert out.loc["a+b", "n_rows"] == 1
        assert out.loc["a+b", "is_key"] == 1
