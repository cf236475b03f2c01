"""Batch 84: variogram/madogram, top-k leaderboard turnover (oracle
parity covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestVariogram:
    def _daily(self, counts):
        ts, day0 = [], datetime.datetime(2024, 1, 1)
        for d, c in enumerate(counts):
            ts.extend([day0 + datetime.timedelta(days=d)] * c)
        return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                         "event_type": pa.array(["a"] * len(ts))})

    def test_weekly_rhythm_dips_at_lag7(self, ray_session):
        from datatest_ray.stages.temporal import variogram_daily

        cycle = [10, 12, 14, 16, 18, 30, 40]
        out = {r["lag"]: r for r in variogram_daily(
            _ds(self._daily(cycle * 6)), "ts",
            by="event_type").take_all()}
        assert out[7]["gamma"] == 0.0       # exact weekly repetition
        assert out[1]["gamma"] > 5.0

    def test_linear_trend_gamma_scales_with_lag(self, ray_session):
        from datatest_ray.stages.temporal import variogram_daily

        out = {r["lag"]: r for r in variogram_daily(
            _ds(self._daily(list(range(1, 41)))), "ts",
            by="event_type").take_all()}
        assert out[1]["gamma"] == 1.0
        assert out[7]["gamma"] == 7.0
        assert out[14]["gamma"] == 14.0


class TestTopkTurnover:
    def test_known_overlap(self, ray_session):
        from datatest_ray.stages.relational import topk_turnover

        rows = []
        # week 0 top-2: {1, 2}; week 1 top-2: {2, 3}; week 2: {9, 8}
        rows += [(0, 1, 100), (0, 2, 90), (0, 3, 10)]
        rows += [(1, 2, 80), (1, 3, 70), (1, 1, 5)]
        rows += [(2, 9, 60), (2, 8, 50), (2, 1, 1)]
        t = pa.table({
            "period": pa.array([r[0] for r in rows], pa.int64()),
            "key": pa.array([r[1] for r in rows], pa.int64()),
            "score": pa.array([r[2] for r in rows], pa.int64()),
        })
        out = topk_turnover(_ds(t, 1), period_col="period",
                            key_col="key", score_col="score",
                            k=2).take_all()
        assert len(out) == 2
        assert (out[0]["period_a"], out[0]["period_b"]) == (0, 1)
        assert out[0]["n_common"] == 1       # {1,2} vs {2,3}
        assert out[0]["jaccard"] == round(1 / 3, 6)
        assert out[1]["n_common"] == 0       # {2,3} vs {9,8}
        assert out[1]["jaccard"] == 0.0

    def test_stable_leaderboard(self, ray_session):
        from datatest_ray.stages.relational import topk_turnover

        rows = [(p, k, 100 - k) for p in range(4) for k in range(6)]
        t = pa.table({
            "period": pa.array([r[0] for r in rows], pa.int64()),
            "key": pa.array([r[1] for r in rows], pa.int64()),
            "score": pa.array([r[2] for r in rows], pa.int64()),
        })
        out = topk_turnover(_ds(t), period_col="period",
                            key_col="key", score_col="score",
                            k=3).take_all()
        assert all(r["jaccard"] == 1.0 for r in out)
