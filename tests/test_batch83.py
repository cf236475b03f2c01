"""Batch 83: first-passage summary, above-median streak (oracle
parity covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestFirstPassage:
    def test_known_crossings(self, ray_session):
        from datatest_ray.stages.winfunc import first_passage

        day0 = datetime.datetime(2024, 1, 1)
        rows = []
        # user 1: crosses 100 on event 3 (40+40+40)
        for i, v in enumerate([40.0, 40.0, 40.0, 5.0]):
            rows.append((1, day0 + datetime.timedelta(hours=i), v, i))
        # user 2: crosses on first event
        rows.append((2, day0, 500.0, 100))
        # user 3: never crosses
        rows.append((3, day0, 1.0, 200))
        t = pa.table({
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "v": pa.array([r[2] for r in rows], pa.float64()),
            "id": pa.array([r[3] for r in rows], pa.int64()),
        })
        out = first_passage(_ds(t), by="u", ts_col="ts",
                            value_col="v", id_col="id",
                            threshold=100.0).take_all()[0]
        assert out["n_keys"] == 3
        assert out["n_crossed"] == 2
        assert out["min_events"] == 1
        assert out["max_events"] == 3
        assert out["median_events"] == 1   # lower median of {1, 3}

    def test_no_crossings(self, ray_session):
        from datatest_ray.stages.winfunc import first_passage

        day0 = datetime.datetime(2024, 1, 1)
        t = pa.table({
            "u": pa.array([1, 2], pa.int64()),
            "ts": pa.array([day0, day0], pa.timestamp("us")),
            "v": pa.array([1.0, 2.0], pa.float64()),
            "id": pa.array([0, 1], pa.int64()),
        })
        out = first_passage(_ds(t, 1), by="u", ts_col="ts",
                            value_col="v", id_col="id",
                            threshold=1e6).take_all()[0]
        assert out["n_crossed"] == 0
        assert out["median_events"] is None


class TestAboveMedianStreak:
    def _daily(self, counts):
        ts, day0 = [], datetime.datetime(2024, 1, 1)
        for d, c in enumerate(counts):
            ts.extend([day0 + datetime.timedelta(days=d)] * c)
        return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                         "event_type": pa.array(["a"] * len(ts))})

    def test_planted_hot_spell(self, ray_session):
        from datatest_ray.stages.temporal import above_median_streak

        counts = [10] * 10 + [30] * 4 + [10] * 6
        out = above_median_streak(_ds(self._daily(counts)), "ts",
                                  by="event_type").take_all()[0]
        assert out["n_above"] == 4
        assert out["longest_streak"] == 4

    def test_alternating_streak_one(self, ray_session):
        from datatest_ray.stages.temporal import above_median_streak

        out = above_median_streak(_ds(self._daily([5, 20] * 8), 1),
                                  "ts", by="event_type").take_all()[0]
        assert out["longest_streak"] == 1
