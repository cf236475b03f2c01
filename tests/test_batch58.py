"""Batch 58: Borda/Copeland voting fusion, Page-Hinkley drift,
one-way ICC (oracle parity covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestBordaCopeland:
    def _run(self, rows):
        from datatest_ray.stages.alloc import borda_copeland

        t = pa.table({
            "v": pa.array([r[0] for r in rows]),
            "c": pa.array([r[1] for r in rows]),
            "s": pa.array([r[2] for r in rows], pa.int64()),
        })
        out = borda_copeland(_ds(t, 1), voter_col="v", cand_col="c",
                             score_col="s").take_all()
        return {r["c"]: r for r in out}

    def test_unanimous_winner(self, ray_session):
        rows = [("v1", "a", 30), ("v1", "b", 20), ("v1", "c", 10),
                ("v2", "a", 9), ("v2", "b", 5), ("v2", "c", 1),
                ("v3", "a", 7), ("v3", "b", 6), ("v3", "c", 5)]
        out = self._run(rows)
        assert out["a"]["borda"] == 6      # rank 1 x3 -> 2 pts each
        assert out["b"]["borda"] == 3
        assert out["c"]["borda"] == 0
        assert out["a"]["copeland"] == 2   # beats both
        assert out["c"]["copeland"] == -2  # beaten by both

    def test_condorcet_vs_borda_split(self, ray_session):
        # b wins every pairwise majority but a piles up Borda points
        rows = [("v1", "a", 10), ("v1", "b", 9), ("v1", "c", 1),
                ("v2", "a", 10), ("v2", "b", 9), ("v2", "c", 1),
                ("v3", "b", 10), ("v3", "c", 9), ("v3", "a", 1)]
        out = self._run(rows)
        # a beats b AND c in v1+v2 (2/3 majorities) -> Condorcet winner
        assert out["a"]["copeland"] == 2
        assert out["b"]["copeland"] == 0
        assert out["c"]["copeland"] == -2

    def test_absent_pair_scores_zero(self, ray_session):
        # candidate c absent for v2: ballot zero-fills, so c ranks last
        rows = [("v1", "a", 5), ("v1", "c", 9),
                ("v2", "a", 3)]
        out = self._run(rows)
        assert set(out) == {"a", "c"}
        # v1: c(9) > a(5); v2: a(3) > c(0) -> 1 win each, tie
        assert out["a"]["copeland"] == 0
        assert out["c"]["copeland"] == 0
        assert out["a"]["borda"] == 1
        assert out["c"]["borda"] == 1


class TestPageHinkley:
    def _daily(self, counts):
        ts, day0 = [], datetime.datetime(2024, 1, 1)
        for d, c in enumerate(counts):
            ts.extend([day0 + datetime.timedelta(days=d)] * c)
        return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                         "event_type": pa.array(["a"] * len(ts))})

    def test_upward_shift_loads_ph_up(self, ray_session):
        from datatest_ray.stages.temporal import page_hinkley_daily

        counts = [10] * 20 + [40] * 10
        out = page_hinkley_daily(_ds(self._daily(counts)), "ts",
                                 by="event_type").take_all()[0]
        assert out["ph_up"] > 10.0
        assert out["ph_up"] > out["ph_down"]

    def test_constant_series_zero(self, ray_session):
        from datatest_ray.stages.temporal import page_hinkley_daily

        out = page_hinkley_daily(_ds(self._daily([5] * 15), 1), "ts",
                                 by="event_type").take_all()[0]
        assert out["ph_up"] == 0.0 and out["ph_down"] == 0.0


class TestIccOneway:
    def _run(self, groups):
        from datatest_ray.stages.stattests import icc_oneway

        g, v = [], []
        for i, vals in enumerate(groups):
            g.extend([i] * len(vals))
            v.extend(vals)
        t = pa.table({"g": pa.array(g, pa.int64()),
                      "v": pa.array(v, pa.float64())})
        return icc_oneway(_ds(t), group_col="g",
                          value_col="v").take_all()[0]

    def test_perfectly_clustered_near_one(self, ray_session):
        # groups internally identical, far apart -> ICC ~ 1
        out = self._run([[10.0] * 5, [50.0] * 5, [90.0] * 5])
        assert out["icc"] == 1.0

    def test_no_group_effect_near_zero(self, ray_session):
        rng = np.random.RandomState(8)
        groups = [list(np.round(rng.normal(50, 10, 20), 2))
                  for _ in range(15)]
        out = self._run(groups)
        assert abs(out["icc"]) < 0.15

    def test_single_group_null(self, ray_session):
        out = self._run([[1.0, 2.0, 3.0]])
        assert out["icc"] is None
