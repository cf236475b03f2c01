"""Batch 53: Brunner-Munzel, Lepage, Cucconi, Gumbel weekly-max fit
(oracle parity covered by test_oracle.py)."""

import datetime
import math

import numpy as np
import pyarrow as pa


def _two_sample_ds(xa, xb, n_parts=3):
    import ray.data as rd

    t = pa.table({
        "g": pa.array(["a"] * len(xa) + ["b"] * len(xb)),
        "v": pa.array(list(xa) + list(xb), pa.float64()),
    })
    return rd.from_arrow(t).repartition(n_parts)


def _midranks(pooled):
    """Average ranks (1-based) with ties, brute force."""
    pooled = np.asarray(pooled, dtype=np.float64)
    order = np.argsort(pooled, kind="stable")
    ranks = np.empty(len(pooled))
    sorted_v = pooled[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    return ranks


def _bm_brute(xa, xb):
    """scipy.stats.brunnermunzel reference, hand-rolled (no scipy in
    this env)."""
    xa, xb = np.asarray(xa, float), np.asarray(xb, float)
    na, nb = len(xa), len(xb)
    pooled = np.concatenate([xa, xb])
    rc = _midranks(pooled)
    rca, rcb = rc[:na], rc[na:]
    ra = _midranks(xa)
    rb = _midranks(xb)
    ma, mb = rca.mean(), rcb.mean()
    sa = np.sum((rca - ra - ma + (na + 1) / 2.0) ** 2) / (na - 1)
    sb = np.sum((rcb - rb - mb + (nb + 1) / 2.0) ** 2) / (nb - 1)
    w = na * nb * (mb - ma) / ((na + nb) * math.sqrt(na * sa + nb * sb))
    p_hat = (mb - (nb + 1) / 2.0) / na
    return p_hat, w


class TestBrunnerMunzel:
    def test_matches_brute_force(self, ray_session):
        from datatest_ray.stages.stattests import brunner_munzel

        rng = np.random.RandomState(11)
        xa = np.round(rng.normal(0, 1, 40), 1)   # rounding makes ties
        xb = np.round(rng.normal(0.5, 2, 55), 1)
        out = brunner_munzel(_two_sample_ds(xa, xb), value_col="v",
                             group_col="g", a="a", b="b").take_all()[0]
        p_hat, w = _bm_brute(xa, xb)
        assert (out["n_a"], out["n_b"]) == (40, 55)
        assert abs(out["p_hat"] - p_hat) < 1e-6
        assert abs(out["w"] - w) < 1e-6

    def test_identical_samples_centered(self, ray_session):
        from datatest_ray.stages.stattests import brunner_munzel

        x = list(range(30))
        out = brunner_munzel(_two_sample_ds(x, x), value_col="v",
                             group_col="g", a="a", b="b").take_all()[0]
        assert out["p_hat"] == 0.5


class TestLepage:
    def test_pure_location_shift_loads_z_w(self, ray_session):
        from datatest_ray.stages.stattests import lepage_test

        rng = np.random.RandomState(5)
        base = rng.normal(0, 1, 60)
        out = lepage_test(_two_sample_ds(base, base + 3.0),
                          value_col="v", group_col="g",
                          a="a", b="b").take_all()[0]
        assert abs(out["z_w"]) > 5.0          # strong location signal
        assert abs(out["z_ab"]) < 2.0         # no scale signal
        # L is squared from the UNROUNDED z components
        assert abs(out["lepage_l"]
                   - (out["z_w"] ** 2 + out["z_ab"] ** 2)) < 1e-4

    def test_pure_scale_shift_loads_z_ab(self, ray_session):
        from datatest_ray.stages.stattests import lepage_test

        rng = np.random.RandomState(6)
        base = rng.normal(0, 1, 80)
        out = lepage_test(_two_sample_ds(base, base * 6.0),
                          value_col="v", group_col="g",
                          a="a", b="b").take_all()[0]
        assert abs(out["z_ab"]) > 3.0
        assert abs(out["z_ab"]) > abs(out["z_w"])


class TestCucconi:
    def _brute(self, xa, xb):
        na, n = len(xa), len(xa) + len(xb)
        pooled = np.concatenate([xa, xb])
        r = _midranks(pooled)[:na]
        den = math.sqrt(na * (n - na) * (n + 1) * (2 * n + 1)
                        * (8 * n + 11) / 5.0)
        u = (6 * np.sum(r ** 2) - na * (n + 1) * (2 * n + 1)) / den
        v = (6 * np.sum(((n + 1) - r) ** 2)
             - na * (n + 1) * (2 * n + 1)) / den
        rho = 2 * (n * n - 4) / ((2 * n + 1) * (8 * n + 11)) - 1
        c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
        return u, v, c

    def test_matches_brute_force(self, ray_session):
        from datatest_ray.stages.stattests import cucconi_test

        rng = np.random.RandomState(9)
        xa = np.round(rng.normal(0, 1, 35), 1)
        xb = np.round(rng.normal(1, 3, 45), 1)
        out = cucconi_test(_two_sample_ds(xa, xb), value_col="v",
                           group_col="g", a="a", b="b").take_all()[0]
        u, v, c = self._brute(xa, xb)
        assert abs(out["u"] - u) < 1e-6
        assert abs(out["v"] - v) < 1e-6
        assert abs(out["c"] - c) < 1e-6

    def test_null_sample_small_c(self, ray_session):
        from datatest_ray.stages.stattests import cucconi_test

        rng = np.random.RandomState(10)
        pooled = rng.normal(0, 1, 100)
        out = cucconi_test(_two_sample_ds(pooled[:50], pooled[50:]),
                           value_col="v", group_col="g",
                           a="a", b="b").take_all()[0]
        assert out["c"] < 3.0  # ~chi2(2)/2 scale under H0


class TestGumbelWeeklyMax:
    def _events(self, daily_counts):
        # epoch-week aligned start (epoch day 19726 = 7 * 2818)
        ts, day0 = [], datetime.datetime(2024, 1, 4)
        for d, c in enumerate(daily_counts):
            ts.extend([day0 + datetime.timedelta(days=d)] * c)
        return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                         "event_type": pa.array(["a"] * len(ts))})

    def test_known_maxima(self, ray_session):
        import ray.data as rd

        from datatest_ray.stages.temporal import gumbel_weekly_max

        # 3 full weeks with peaks 10, 20, 30
        counts = ([1] * 6 + [10]) + ([20] + [2] * 6) + ([3] * 3 + [30]
                                                        + [3] * 3)
        out = gumbel_weekly_max(
            rd.from_arrow(self._events(counts)).repartition(2),
            "ts", by="event_type").take_all()[0]
        assert out["n_weeks"] == 3
        s = np.std([10, 20, 30], ddof=1)
        beta = s * math.sqrt(6) / math.pi
        mu = 20 - 0.5772156649015329 * beta
        assert abs(out["beta"] - beta) < 1e-6
        assert abs(out["mu"] - mu) < 1e-6

    def test_single_week_null_fit(self, ray_session):
        import ray.data as rd

        from datatest_ray.stages.temporal import gumbel_weekly_max

        out = gumbel_weekly_max(
            rd.from_arrow(self._events([5, 6, 7])), "ts",
            by="event_type").take_all()[0]
        assert out["n_weeks"] == 1
        assert out["mu"] is None and out["beta"] is None
