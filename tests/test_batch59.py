"""Batch 59: seasonal Mann-Kendall, turning points, Bartels rank von
Neumann, isotonic PAVA calibration (oracle parity for the first three
covered by test_oracle.py)."""

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


class TestSeasonalMK:
    def test_pure_seasonality_is_not_trend(self, ray_session):
        from datatest_ray.stages.temporal import seasonal_mk_daily

        cycle = [10, 12, 14, 16, 18, 30, 40]
        out = seasonal_mk_daily(_ds(_daily(cycle * 5)), "ts",
                                by="event_type").take_all()[0]
        # exactly periodic: every within-season pair is a tie -> S = 0
        assert out["s"] == 0

    def test_trend_plus_seasonality_detected(self, ray_session):
        from datatest_ray.stages.temporal import seasonal_mk_daily

        cycle = [10, 12, 14, 16, 18, 30, 40]
        counts = [c + 3 * w for w in range(6) for c in cycle]
        out = seasonal_mk_daily(_ds(_daily(counts)), "ts",
                                by="event_type").take_all()[0]
        # every within-season pair increases: S = 7 * C(6,2) = 105
        assert out["s"] == 105
        assert out["z"] > 3.0


class TestTurningPoints:
    def test_sawtooth_maximal(self, ray_session):
        from datatest_ray.stages.temporal import turning_points_daily

        counts = [5, 30] * 10
        out = turning_points_daily(_ds(_daily(counts)), "ts",
                                   by="event_type").take_all()[0]
        assert out["t"] == 18          # every interior day turns
        assert out["z"] > 3.0

    def test_monotone_has_none(self, ray_session):
        from datatest_ray.stages.temporal import turning_points_daily

        out = turning_points_daily(_ds(_daily(list(range(1, 16)))),
                                   "ts", by="event_type").take_all()[0]
        assert out["t"] == 0
        assert out["z"] < -3.0


class TestBartels:
    def test_monotone_low_oscillating_high(self, ray_session):
        from datatest_ray.stages.temporal import bartels_rank_daily

        lo = bartels_rank_daily(_ds(_daily(list(range(1, 21)))), "ts",
                                by="event_type").take_all()[0]
        hi = bartels_rank_daily(_ds(_daily([5, 30] * 10)), "ts",
                                by="event_type").take_all()[0]
        assert lo["rvn"] < 0.5
        assert hi["rvn"] > 3.0

    def test_constant_null(self, ray_session):
        from datatest_ray.stages.temporal import bartels_rank_daily

        out = bartels_rank_daily(_ds(_daily([3] * 8), 1), "ts",
                                 by="event_type").take_all()[0]
        assert out["rvn"] is None


class TestIsotonicCalibration:
    def _run(self, scores, labels, n_bins=4):
        from datatest_ray.stages.mlprep import isotonic_calibration

        t = pa.table({"s": pa.array(scores, pa.float64()),
                      "y": pa.array([bool(v) for v in labels])})
        return isotonic_calibration(
            _ds(t), score_col="s",
            label_expr=lambda b: b.column("y"),
            n_bins=n_bins).take_all()

    def test_monotone_input_unchanged(self, ray_session):
        scores, labels = [], []
        rates = [0.0, 0.25, 0.5, 1.0]
        for b, rate in enumerate(rates):
            for i in range(8):
                scores.append(b + 0.5)      # bins 0..3 over [0.5, 3.5]
                labels.append(1 if i < rate * 8 else 0)
        out = self._run(scores, labels)
        assert [r["iso_rate"] for r in out] == \
            [r["raw_rate"] for r in out]

    def test_violation_pooled(self, ray_session):
        # raw rates 0.8 then 0.2: PAVA pools to the weighted mean 0.5
        scores = [0.5] * 10 + [1.5] * 10
        labels = [1] * 8 + [0] * 2 + [1] * 2 + [0] * 8
        out = self._run(scores, labels, n_bins=2)
        assert [r["raw_rate"] for r in out] == [0.8, 0.2]
        assert [r["iso_rate"] for r in out] == [0.5, 0.5]

    def test_matches_brute_force_pava(self, ray_session):
        rng = np.random.RandomState(4)
        scores = list(rng.uniform(0, 1, 400))
        labels = [1 if rng.rand() < s * 0.8 else 0 for s in scores]
        out = self._run(scores, labels, n_bins=8)
        # brute-force PAVA over the same bins
        lo, hi = min(scores), max(scores)
        width = (hi - lo) / 8
        bins = np.minimum(((np.array(scores) - lo) / width).astype(int),
                          7)
        n = np.bincount(bins, minlength=8).astype(float)
        pos = np.bincount(bins, weights=labels, minlength=8)
        keep = n > 0
        n, pos = n[keep], pos[keep]
        blocks = []
        for w, p in zip(n, pos):
            blocks.append([w, p])
            while (len(blocks) > 1 and blocks[-2][1] * blocks[-1][0]
                   > blocks[-1][1] * blocks[-2][0]):
                w2, p2 = blocks.pop()
                blocks[-1][0] += w2
                blocks[-1][1] += p2
        expect = []
        for w, p in blocks:
            cnt, acc = 0, 0.0
            while acc < w - 1e-9:
                acc += n[len(expect) + cnt]
                cnt += 1
            expect.extend([p / w] * cnt)
        got = [r["iso_rate"] for r in out]
        assert len(got) == len(expect)
        assert all(abs(a - round(b, 6)) < 1e-9
                   for a, b in zip(got, expect))
        # the curve is monotone nondecreasing
        assert all(got[i] <= got[i + 1] + 1e-9
                   for i in range(len(got) - 1))
