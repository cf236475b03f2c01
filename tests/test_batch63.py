"""Batch 63: lag-1 Granger causality, binary transfer entropy (oracle
parity covered by test_oracle.py)."""

import datetime

import numpy as np
import pyarrow as pa


def _events_two_types(xa, xb):
    ts, et = [], []
    day0 = datetime.datetime(2024, 1, 1)
    for d, (ca, cb) in enumerate(zip(xa, xb)):
        t = day0 + datetime.timedelta(days=d)
        ts.extend([t] * ca + [t] * cb)
        et.extend(["click"] * ca + ["purchase"] * cb)
    return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                     "event_type": pa.array(et)})


def _ds(t, n=2):
    import ray.data as rd

    return rd.from_arrow(t).repartition(n)


class TestGrangerLag1:
    def test_planted_lead_detected(self, ray_session):
        from datatest_ray.stages.temporal import granger_lag1_daily

        rng = np.random.RandomState(3)
        x = list(rng.randint(5, 40, 61))
        # purchase tracks YESTERDAY's clicks almost exactly
        y = [10] + [xi // 2 + int(rng.randint(0, 2)) for xi in x[:-1]]
        out = granger_lag1_daily(
            _ds(_events_two_types(x, y)), "ts", type_col="event_type",
            cause="click", effect="purchase").take_all()[0]
        assert out["f"] > 10.0
        assert out["b_x"] > 0.3

    def test_independent_small_f(self, ray_session):
        from datatest_ray.stages.temporal import granger_lag1_daily

        rng = np.random.RandomState(9)
        x = list(rng.randint(5, 40, 80))
        y = list(rng.randint(5, 40, 80))
        out = granger_lag1_daily(
            _ds(_events_two_types(x, y)), "ts", type_col="event_type",
            cause="click", effect="purchase").take_all()[0]
        assert out["f"] < 4.0


class TestTransferEntropy:
    def test_copied_signal_has_te(self, ray_session):
        from datatest_ray.stages.temporal import transfer_entropy_daily

        rng = np.random.RandomState(1)
        # continuous-ish x keeps its median interior, so the binary
        # split is non-degenerate
        x = list(rng.randint(5, 40, 80))
        y = [10] + [35 if xi > 22 else 6 for xi in x[:-1]]
        out = transfer_entropy_daily(
            _ds(_events_two_types(x, y)), "ts", type_col="event_type",
            cause="click", effect="purchase").take_all()[0]
        # y_t is a deterministic function of x_{t-1}: TE near its
        # 1-bit ceiling minus what y's own lag already explains
        assert out["te"] > 0.5

    def test_independent_near_zero(self, ray_session):
        from datatest_ray.stages.temporal import transfer_entropy_daily

        rng = np.random.RandomState(2)
        x = list(rng.choice([5, 40], 120))
        y = list(rng.choice([5, 40], 120))
        out = transfer_entropy_daily(
            _ds(_events_two_types(x, y)), "ts", type_col="event_type",
            cause="click", effect="purchase").take_all()[0]
        assert out["te"] < 0.1
