"""Batch 56: Hoeffding's D, distance correlation, Ljung-Box, Quade
test (oracle parity covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _events_two_types(xa, xb):
    """Daily counts for types a (xa) and b (xb) on aligned days."""
    ts, et = [], []
    day0 = datetime.datetime(2024, 1, 1)
    for d, (ca, cb) in enumerate(zip(xa, xb)):
        t = day0 + datetime.timedelta(days=d)
        ts.extend([t] * ca)
        et.extend(["a"] * ca)
        ts.extend([t] * cb)
        et.extend(["b"] * cb)
    return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                     "event_type": pa.array(et)})


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestHoeffdingD:
    def test_strong_dependence_positive(self, ray_session):
        from datatest_ray.stages.temporal import hoeffding_d_daily

        xa = list(range(1, 31))
        xb = [v * 2 for v in xa]  # perfect monotone dependence
        out = hoeffding_d_daily(_ds(_events_two_types(xa, xb)), "ts",
                                type_col="event_type", type_a="a",
                                type_b="b").take_all()[0]
        assert out["n"] == 30
        # D is bounded by 1/30 for continuous data; monotone -> max
        assert out["d"] > 0.02

    def test_independent_near_zero(self, ray_session):
        from datatest_ray.stages.temporal import hoeffding_d_daily

        rng = np.random.RandomState(2)
        xa = list(rng.randint(1, 40, 40))
        xb = list(rng.randint(1, 40, 40))
        out = hoeffding_d_daily(_ds(_events_two_types(xa, xb)), "ts",
                                type_col="event_type", type_a="a",
                                type_b="b").take_all()[0]
        # independent data: |D| stays near 0 (well under the monotone
        # test's 0.02; sampling noise at n=40 allows ~0.02)
        assert abs(out["d"]) < 0.02


class TestDistanceCorrelation:
    def test_linear_dependence_is_one(self, ray_session):
        from datatest_ray.stages.temporal import (
            distance_correlation_daily)

        xa = list(range(1, 26))
        xb = [3 * v + 2 for v in xa]
        out = distance_correlation_daily(
            _ds(_events_two_types(xa, xb)), "ts",
            type_col="event_type", type_a="a", type_b="b").take_all()[0]
        assert out["dcor"] == 1.0

    def test_independent_small(self, ray_session):
        from datatest_ray.stages.temporal import (
            distance_correlation_daily)

        rng = np.random.RandomState(7)
        xa = list(rng.randint(1, 50, 60))
        xb = list(rng.randint(1, 50, 60))
        out = distance_correlation_daily(
            _ds(_events_two_types(xa, xb)), "ts",
            type_col="event_type", type_a="a", type_b="b").take_all()[0]
        assert out["dcor"] < 0.35


class TestLjungBox:
    def _daily(self, counts):
        ts, day0 = [], datetime.datetime(2024, 1, 1)
        for d, c in enumerate(counts):
            ts.extend([day0 + datetime.timedelta(days=d)] * c)
        return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                         "event_type": pa.array(["a"] * len(ts))})

    def test_periodic_series_large_q(self, ray_session):
        from datatest_ray.stages.temporal import ljung_box_daily

        counts = [5, 40] * 20  # strong lag-2 structure
        out = ljung_box_daily(_ds(self._daily(counts)), "ts",
                              by="event_type", max_lag=7).take_all()[0]
        assert out["n_days"] == 40
        assert out["q"] > 50.0

    def test_constant_series_null(self, ray_session):
        from datatest_ray.stages.temporal import ljung_box_daily

        out = ljung_box_daily(_ds(self._daily([7] * 20)), "ts",
                              by="event_type").take_all()[0]
        assert out["q"] is None  # zero variance

    def test_short_series_null(self, ray_session):
        from datatest_ray.stages.temporal import ljung_box_daily

        out = ljung_box_daily(_ds(self._daily([1, 5, 2]), 1), "ts",
                              by="event_type").take_all()[0]
        assert out["q"] is None  # n <= max_lag


class TestQuade:
    def _table(self, blocks):
        """blocks: list of dicts treatment -> value, one per subject."""
        s, t, v = [], [], []
        for i, blk in enumerate(blocks):
            for k, val in blk.items():
                s.append(i)
                t.append(k)
                v.append(val)
        return pa.table({"s": pa.array(s, pa.int64()),
                         "t": pa.array(t),
                         "v": pa.array(v, pa.float64())})

    def test_consistent_treatment_effect(self, ray_session):
        from datatest_ray.stages.stattests import quade_test

        # treatment c always biggest, a always smallest, spread grows
        blocks = [{"a": 1.0 * m, "b": 2.0 * m, "c": 3.0 * m}
                  for m in range(1, 9)]
        out = quade_test(_ds(self._table(blocks)), subject_col="s",
                         treatment_col="t", treatments=["a", "b", "c"],
                         value_col="v").take_all()[0]
        assert out["n_subjects"] == 8
        # consistent c > b > a ordering: F far above any F(2,14)
        # critical value (~3.7 at alpha=0.05)
        assert out["quade_f"] > 20.0

    def test_no_effect_small_f(self, ray_session):
        from datatest_ray.stages.stattests import quade_test

        rng = np.random.RandomState(3)
        blocks = []
        for _ in range(12):
            vals = rng.permutation([1.0, 2.0, 3.0])
            blocks.append({"a": vals[0], "b": vals[1], "c": vals[2]})
        out = quade_test(_ds(self._table(blocks)), subject_col="s",
                         treatment_col="t", treatments=["a", "b", "c"],
                         value_col="v").take_all()[0]
        assert out["n_subjects"] == 12
        assert out["quade_f"] is not None and out["quade_f"] < 4.0

    def test_incomplete_blocks_dropped(self, ray_session):
        from datatest_ray.stages.stattests import quade_test

        blocks = [{"a": 1.0, "b": 2.0, "c": 3.0},
                  {"a": 5.0, "b": 1.0}]  # incomplete: dropped
        out = quade_test(_ds(self._table(blocks), 1), subject_col="s",
                         treatment_col="t", treatments=["a", "b", "c"],
                         value_col="v").take_all()[0]
        assert out["n_subjects"] == 1
        assert out["quade_f"] is None  # single block: no test
