"""Batch 51: Chatterjee's xi, per-user max drawdown, Bollinger-band
breaches, stochastic/Donchian indicators (oracle parity for all four
covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _ds(t: pa.Table):
    import ray.data as rd

    return rd.from_arrow(t)


def _daily_events(counts, et="a"):
    ts = []
    day0 = datetime.datetime(2024, 1, 1)
    for d, c in enumerate(counts):
        ts.extend([day0 + datetime.timedelta(days=d)] * c)
    return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                     "event_type": pa.array([et] * len(ts))})


class TestChatterjeeXi:
    def _xi(self, x, y, n_parts=3):
        from datatest_ray.stages.stattests import chatterjee_xi

        t = pa.table({
            "x": pa.array(x, pa.float64()),
            "y": pa.array(y, pa.float64()),
            "k1": pa.array(range(len(x)), pa.int64()),
            "k2": pa.array([0] * len(x), pa.int64()),
        })
        import ray.data as rd

        ds = rd.from_arrow(t).repartition(n_parts)
        out = chatterjee_xi(ds, x_col="x", y_col="y",
                            tie_cols=["k1", "k2"]).take_all()
        assert len(out) == 1
        return out[0]

    def _brute(self, x, y):
        # reference: tie-corrected xi with the same (x, k1) tie-break
        order = np.lexsort((np.arange(len(x)), np.asarray(x)))
        ys = np.asarray(y)[order]
        n = len(ys)
        r = np.array([(np.asarray(y) <= v).sum() for v in ys])
        l = np.array([(np.asarray(y) >= v).sum() for v in ys])
        s = np.abs(np.diff(r)).sum()
        d = (l * (n - l)).sum()
        return 1.0 - n * s / (2.0 * d)

    def test_perfect_function_gives_one(self, ray_session):
        x = list(np.linspace(0, 10, 40))
        y = [v * v for v in x]  # y a deterministic function of x
        out = self._xi(x, y)
        # finite-n ceiling of the no-ties statistic is 1 - 3/(n+1)
        assert out["xi"] == round(1.0 - 3.0 / 41.0, 6)

    def test_nonmonotone_dependence_detected(self, ray_session):
        x = list(np.linspace(-5, 5, 60))
        y = [v * v for v in x]  # parabola: Pearson ~0, xi high
        out = self._xi(x, y)
        assert out["xi"] > 0.8

    def test_matches_brute_force_with_ties(self, ray_session):
        rng = np.random.RandomState(7)
        x = rng.rand(50)
        y = rng.randint(0, 5, 50).astype(float)  # heavy y ties
        out = self._xi(list(x), list(y), n_parts=4)
        assert out["n"] == 50
        assert abs(out["xi"] - round(self._brute(x, y), 6)) < 1e-9


class TestMaxDrawdown:
    def test_known_path(self, ray_session):
        from datatest_ray.stages.winfunc import max_drawdown

        # balance path: 1, 3, 2, 5, 1 -> max drawdown 4 (5 -> 1)
        deltas = [1.0, 2.0, -1.0, 3.0, -4.0]
        day0 = datetime.datetime(2024, 1, 1)
        t = pa.table({
            "user_id": pa.array([7] * 5, pa.int64()),
            "ts": pa.array([day0 + datetime.timedelta(hours=i)
                            for i in range(5)], pa.timestamp("us")),
            "value": pa.array(deltas, pa.float64()),
            "event_id": pa.array(range(5), pa.int64()),
        })
        out = max_drawdown(_ds(t), by="user_id", ts_col="ts",
                           value_col="value", id_col="event_id").take_all()
        assert len(out) == 1
        assert out[0]["n_events"] == 5
        assert out[0]["final_bal"] == 1.0
        assert out[0]["max_drawdown"] == 4.0

    def test_monotone_up_has_zero_drawdown(self, ray_session):
        from datatest_ray.stages.winfunc import max_drawdown

        day0 = datetime.datetime(2024, 1, 1)
        t = pa.table({
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array([day0 + datetime.timedelta(hours=i)
                            for i in range(4)], pa.timestamp("us")),
            "value": pa.array([1.0, 1.0, 1.0, -2.5], pa.float64()),
            "event_id": pa.array(range(4), pa.int64()),
        })
        out = {r["user_id"]: r for r in max_drawdown(
            _ds(t), by="user_id", ts_col="ts", value_col="value",
            id_col="event_id").take_all()}
        assert out[1]["max_drawdown"] == 0.0
        # single-event key: runmax equals cum, so drawdown is 0 (the
        # peak is the first observed balance, not an implicit 0 start)
        assert out[2]["max_drawdown"] == 0.0
        assert out[2]["final_bal"] == -2.5


class TestBollinger:
    def test_spike_breaches_high(self, ray_session):
        from datatest_ray.stages.temporal import bollinger_daily

        counts = [10] * 10 + [40] + [10] * 3
        out = bollinger_daily(_ds(_daily_events(counts)), "ts",
                              by="event_type", window=7).take_all()
        assert len(out) == 1
        r = out[0]
        assert r["n_days"] == len(counts)
        assert r["n_windows"] == len(counts) - 6
        assert r["n_breach_hi"] == 1
        assert r["n_breach_lo"] == 0

    def test_constant_series_never_breaches(self, ray_session):
        from datatest_ray.stages.temporal import bollinger_daily

        out = bollinger_daily(_ds(_daily_events([5] * 12)), "ts",
                              by="event_type", window=7).take_all()
        assert out[0]["n_breach_hi"] == 0
        assert out[0]["n_breach_lo"] == 0


class TestStochDonchian:
    def test_new_high_is_breakout_and_overheated(self, ray_session):
        from datatest_ray.stages.temporal import stoch_donchian_daily

        counts = list(range(10, 24)) + [50]  # last day: fresh 15-day high
        out = stoch_donchian_daily(_ds(_daily_events(counts)), "ts",
                                   by="event_type", window=14).take_all()
        r = out[0]
        assert r["n_days"] == 15
        assert r["n_breakout"] == 1
        # every full window of the rising ramp has %K = 1.0 >= 0.8
        assert r["n_k_hi"] == 2

    def test_short_series_counts_nothing(self, ray_session):
        from datatest_ray.stages.temporal import stoch_donchian_daily

        out = stoch_donchian_daily(_ds(_daily_events([3] * 5)), "ts",
                                   by="event_type", window=14).take_all()
        r = out[0]
        assert (r["n_k_hi"], r["n_breakout"]) == (0, 0)
