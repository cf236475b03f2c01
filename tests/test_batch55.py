"""Batch 55: Weibull median-rank fit, Gini decision stump, Cox-Stuart
trend test, LOO target-encoding audit (oracle parity covered by
test_oracle.py)."""

import datetime
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ds(t: pa.Table, n_parts=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n_parts)


class TestWeibullFit:
    def test_recovers_exponential_shape(self, ray_session):
        from datatest_ray.stages.stattests import weibull_median_rank_fit

        # exponential (Weibull k=1) via inverse-CDF of a uniform grid
        u = (np.arange(1, 2001) - 0.5) / 2000.0
        x = -np.log(1 - u) * 42.0
        t = pa.table({"v": pa.array(x, pa.float64())})
        out = weibull_median_rank_fit(_ds(t, 4),
                                      value_col="v").take_all()[0]
        assert out["n"] == 2000
        assert abs(out["shape"] - 1.0) < 0.02
        assert abs(out["log_scale"] - math.log(42.0)) < 0.05

    def test_recovers_planted_shape_two(self, ray_session):
        from datatest_ray.stages.stattests import weibull_median_rank_fit

        u = (np.arange(1, 1001) - 0.5) / 1000.0
        x = 5.0 * (-np.log(1 - u)) ** 0.5  # Weibull k=2, lambda=5
        t = pa.table({"v": pa.array(x, pa.float64())})
        out = weibull_median_rank_fit(_ds(t, 3),
                                      value_col="v").take_all()[0]
        assert abs(out["shape"] - 2.0) < 0.05
        assert abs(out["log_scale"] - math.log(5.0)) < 0.05

    def test_nonpositive_and_single_value(self, ray_session):
        from datatest_ray.stages.stattests import weibull_median_rank_fit

        t = pa.table({"v": pa.array([0.0, -1.0, 3.0, 3.0], pa.float64())})
        out = weibull_median_rank_fit(_ds(t, 1),
                                      value_col="v").take_all()[0]
        assert out["n"] == 2            # only the positive values
        assert out["shape"] is None     # single distinct value: no fit


class TestGiniStump:
    def test_perfectly_separable(self, ray_session):
        from datatest_ray.stages.mlprep import gini_stump

        t = pa.table({
            "s": pa.array([1.0, 2.0, 3.0, 10.0, 11.0, 12.0]),
            "y": pa.array([False, False, False, True, True, True]),
        })
        out = gini_stump(_ds(t), score_col="s",
                         label_expr=lambda b: b.column("y")).take_all()[0]
        assert out["threshold"] == 3.0   # left = all negatives
        assert out["gini"] == 0.0
        assert (out["n"], out["pos"]) == (6, 3)

    def test_tie_breaks_to_smallest_threshold(self, ray_session):
        from datatest_ray.stages.mlprep import gini_stump

        # y constant: every split has gini 0; smallest threshold wins
        t = pa.table({
            "s": pa.array([5.0, 7.0, 9.0]),
            "y": pa.array([True, True, True]),
        })
        out = gini_stump(_ds(t, 1), score_col="s",
                         label_expr=lambda b: b.column("y")).take_all()[0]
        assert out["threshold"] == 5.0
        assert out["gini"] == 0.0


class TestCoxStuart:
    def _ds_daily(self, counts):
        import ray.data as rd

        ts, day0 = [], datetime.datetime(2024, 1, 1)
        for d, c in enumerate(counts):
            ts.extend([day0 + datetime.timedelta(days=d)] * c)
        return rd.from_arrow(pa.table({
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array(["a"] * len(ts))}))

    def test_monotone_up(self, ray_session):
        from datatest_ray.stages.temporal import cox_stuart_daily

        out = cox_stuart_daily(self._ds_daily(list(range(1, 11))), "ts",
                               by="event_type").take_all()[0]
        assert (out["n_pos"], out["n_neg"]) == (5, 0)
        assert out["z"] == round(5 / math.sqrt(5), 6)

    def test_odd_length_drops_middle(self, ray_session):
        from datatest_ray.stages.temporal import cox_stuart_daily

        # 7 days: pairs (d1,d5),(d2,d6),(d3,d7); d4 dropped
        out = cox_stuart_daily(self._ds_daily([5, 5, 5, 9, 5, 5, 5]),
                               "ts", by="event_type").take_all()[0]
        assert out["n_days"] == 7
        assert (out["n_pos"], out["n_neg"]) == (0, 0)
        assert out["z"] is None


class TestLooEncodeAudit:
    def test_closed_form_matches_enumeration(self, ray_session):
        from datatest_ray.stages.mlprep import loo_encode_audit

        vals = [1.0, 2.0, 4.0, 8.0, 15.0]
        t = pa.table({"c": pa.array(["x"] * 5),
                      "v": pa.array(vals, pa.float64())})
        out = loo_encode_audit(_ds(t), cat_col="c",
                               target_col="v").take_all()[0]
        s = sum(vals)
        codes = [(s - v) / 4.0 for v in vals]
        assert abs(out["mean_loo"] - np.mean(codes)) < 1e-6
        assert abs(out["sd_loo"] - np.std(codes)) < 1e-6

    def test_singleton_category_null(self, ray_session):
        from datatest_ray.stages.mlprep import loo_encode_audit

        t = pa.table({"c": pa.array(["solo"]),
                      "v": pa.array([3.0], pa.float64())})
        out = loo_encode_audit(_ds(t, 1), cat_col="c",
                               target_col="v").take_all()[0]
        assert out["n"] == 1
        assert out["mean_loo"] is None and out["sd_loo"] is None
