"""Batch 70: optimal-partitioning changepoints, SAX motifs (sax
oracle parity covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _daily(counts, et="a"):
    ts, day0 = [], datetime.datetime(2024, 1, 1)
    for d, c in enumerate(counts):
        ts.extend([day0 + datetime.timedelta(days=d)] * c)
    return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                     "event_type": pa.array([et] * len(ts))})


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestOptimalChangepoints:
    def test_two_planted_shifts(self, ray_session):
        from datatest_ray.stages.temporal import (
            optimal_changepoints_daily)

        counts = [10] * 10 + [60] * 10 + [25] * 10
        out = optimal_changepoints_daily(
            _ds(_daily(counts)), "ts", by="event_type").take_all()[0]
        assert out["n_changepoints"] == 2
        assert out["split_pos"] == "10,20"

    def test_flat_series_no_changepoints(self, ray_session):
        from datatest_ray.stages.temporal import (
            optimal_changepoints_daily)

        rng = np.random.RandomState(2)
        counts = list(rng.randint(18, 23, 30))
        out = optimal_changepoints_daily(
            _ds(_daily(counts)), "ts", by="event_type").take_all()[0]
        assert out["n_changepoints"] <= 1

    def test_matches_brute_force_dp(self, ray_session):
        from datatest_ray.stages.temporal import (
            optimal_changepoints_daily)

        rng = np.random.RandomState(7)
        counts = list(rng.randint(5, 50, 24))
        out = optimal_changepoints_daily(
            _ds(_daily(counts), 1), "ts", by="event_type").take_all()[0]
        # brute-force same DP
        x = np.array(counts, dtype=float)
        n = len(x)
        c1 = np.concatenate(([0.0], np.cumsum(x)))
        c2 = np.concatenate(([0.0], np.cumsum(x * x)))

        def sse(i, j):
            m = j - i
            s = c1[j] - c1[i]
            return (c2[j] - c2[i]) - s * s / m

        pen = 2.0 * float(np.var(x)) * np.log(n)
        best = np.full(n + 1, np.inf)
        prev = np.zeros(n + 1, dtype=int)
        best[0] = -pen
        for j in range(1, n + 1):
            for i in range(j):
                c = best[i] + sse(i, j) + pen
                if c < best[j] - 1e-12:
                    best[j] = c
                    prev[j] = i
        cps = []
        j = n
        while j > 0:
            i = prev[j]
            if i > 0:
                cps.append(int(i))
            j = i
        assert out["split_pos"] == ",".join(map(str, sorted(cps)))
        assert abs(out["cost"] - round(best[n], 6)) < 1e-6


class TestSaxMotifs:
    def test_periodic_series_has_motifs(self, ray_session):
        from datatest_ray.stages.temporal import sax_motifs_daily

        cycle = [5, 10, 40]
        out = sax_motifs_daily(_ds(_daily(cycle * 8)), "ts",
                               by="event_type").take_all()[0]
        # 3-periodic series: only 3 distinct words, all repeated
        assert out["n_words"] == 3
        assert out["n_repeated"] == 3
        assert out["top_count"] == 8

    def test_constant_series_no_words(self, ray_session):
        from datatest_ray.stages.temporal import sax_motifs_daily

        out = sax_motifs_daily(_ds(_daily([7] * 15), 1), "ts",
                               by="event_type").take_all()[0]
        assert out["n_words"] == 0
        assert out["top_word"] is None
