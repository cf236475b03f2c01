"""Batch 68: EWMA control chart, log-rank survival test (oracle
parity covered by test_oracle.py)."""

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


class TestEwmaChart:
    def test_persistent_small_shift_detected(self, ray_session):
        from datatest_ray.stages.temporal import ewma_chart_daily

        rng = np.random.RandomState(3)
        base = list(rng.poisson(100, 40))
        # sustained +25% shift; note mu/sigma are estimated over the
        # WHOLE series (shift included), which shrinks the signal --
        # the EWMA still accumulates it where a Shewhart chart on the
        # same inflated sigma stays quiet
        shifted = list(rng.poisson(125, 20))
        out = ewma_chart_daily(_ds(_daily(base + shifted)), "ts",
                               by="event_type").take_all()[0]
        assert out["n_breach_hi"] >= 3

    def test_stable_series_quiet(self, ray_session):
        from datatest_ray.stages.temporal import ewma_chart_daily

        rng = np.random.RandomState(5)
        counts = list(rng.poisson(100, 60))
        out = ewma_chart_daily(_ds(_daily(counts)), "ts",
                               by="event_type").take_all()[0]
        assert out["n_breach_hi"] + out["n_breach_lo"] <= 2

    def test_matches_brute_force_recursion(self, ray_session):
        from datatest_ray.stages.temporal import ewma_chart_daily

        counts = [10, 12, 9, 14, 11, 30, 8]
        out = ewma_chart_daily(_ds(_daily(counts), 1), "ts",
                               by="event_type").take_all()[0]
        x = np.array(counts, dtype=float)
        mu = x.mean()
        z = mu
        for v in x:
            z = 0.2 * v + 0.8 * z
        assert out["last_z"] == round(z, 6)


class TestLogRank:
    def _events(self, lifetimes_g1, lifetimes_g2):
        """Users with given lifetimes; even ids = group 1."""
        ts, uid = [], []
        day0 = datetime.datetime(2024, 1, 1)
        u = 0
        for life in lifetimes_g1:
            ts += [day0, day0 + datetime.timedelta(days=life)]
            uid += [u, u]
            u += 2                                 # even ids
        v = 1
        for life in lifetimes_g2:
            ts += [day0, day0 + datetime.timedelta(days=life)]
            uid += [v, v]
            v += 2                                 # odd ids
        return pa.table({"user_id": pa.array(uid, pa.int64()),
                         "ts": pa.array(ts, pa.timestamp("us"))})

    def _run(self, l1, l2):
        import pyarrow.compute as pc

        from datatest_ray.stages.stattests import logrank_test

        return logrank_test(
            _ds(self._events(l1, l2)), id_col="user_id", ts_col="ts",
            group_expr=lambda t: pc.equal(
                pc.bit_wise_and(t.column("user_id"), 1),
                0)).take_all()[0]

    def test_identical_curves_z_near_zero(self, ray_session):
        lifetimes = list(range(1, 41))
        out = self._run(lifetimes, lifetimes)
        assert (out["n1"], out["n2"]) == (40, 40)
        assert abs(out["z"]) < 0.5

    def test_shorter_lives_detected(self, ray_session):
        l1 = list(range(1, 31))            # group 1 dies early
        l2 = [x + 30 for x in range(1, 31)]
        out = self._run(l1, l2)
        # group 1 accumulates deaths faster than expected: O1 > E1
        assert out["o1"] > out["e1"]
        assert out["z"] > 3.0
