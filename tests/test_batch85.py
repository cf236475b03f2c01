"""Batch 85: tail dependence, extremal index (oracle parity covered
by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestTailDependence:
    def _run(self, x, y, q=0.9):
        from datatest_ray.stages.stattests import tail_dependence

        t = pa.table({"x": pa.array(x, pa.float64()),
                      "y": pa.array(y, pa.float64())})
        return tail_dependence(_ds(t), x_col="x", y_col="y",
                               q=q).take_all()[0]

    def test_comonotone_lambda_one(self, ray_session):
        x = list(np.round(np.linspace(1, 100, 200), 2))
        out = self._run(x, x)
        assert out["lambda_u"] == 1.0

    def test_independent_near_q_complement(self, ray_session):
        rng = np.random.RandomState(3)
        x = list(np.round(rng.uniform(0, 100, 5000), 2))
        y = list(np.round(rng.uniform(0, 100, 5000), 2))
        out = self._run(x, y)
        # independence: P(Y > y_q | X > x_q) ~ 1 - q = 0.1
        assert out["lambda_u"] < 0.2

    def test_antithetic_zero(self, ray_session):
        x = list(np.round(np.linspace(1, 100, 200), 2))
        y = x[::-1]
        out = self._run(x, y)
        assert out["lambda_u"] == 0.0


class TestExtremalIndex:
    def _daily(self, counts):
        ts, day0 = [], datetime.datetime(2024, 1, 1)
        for d, c in enumerate(counts):
            ts.extend([day0 + datetime.timedelta(days=d)] * c)
        return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                         "event_type": pa.array(["a"] * len(ts))})

    def test_clustered_spikes_low_theta(self, ray_session):
        from datatest_ray.stages.temporal import extremal_index_daily

        # one 4-day incident in 40 days (10% of days, exactly the
        # mass above the 0.9 quantile)
        counts = [10] * 20 + [50] * 4 + [10] * 16
        out = extremal_index_daily(_ds(self._daily(counts)), "ts",
                                   by="event_type").take_all()[0]
        assert out["n_exceed"] == 4
        assert out["n_clusters"] == 1
        assert out["theta"] == 0.25

    def test_isolated_spikes_theta_one(self, ray_session):
        from datatest_ray.stages.temporal import extremal_index_daily

        counts = [10] * 40
        for i in (5, 15, 25, 35):
            counts[i] = 50
        out = extremal_index_daily(_ds(self._daily(counts)), "ts",
                                   by="event_type").take_all()[0]
        assert out["n_exceed"] == 4
        assert out["theta"] == 1.0
